"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Headliners cover the three cost centers:
* kg_pipeline — full extraction path (tokenize → prefilter → match → triples
  → count), the throughput number that matters at 10^12-file scale;
* dedup/similarity ops (shuffle-heavy);
* relational/window plumbing (whole-stage-codegen baseline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

BENCH_QUERIES = [
    "kg_pipeline",
    "pat_quant_greedy",
    "graph_kleene",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_topk",
    "text_quality",
    "tpch_q1",
    "tpch_join",
]


def run_kg_pipeline(spark, sf_dir: str, replicate: int = 1) -> int:
    """Fused one-shot extraction (annotate+match in one narrow Python stage;
    text-level prefilter pushed to the scan) → triples."""
    from odinson_spark.lang.rules import RuleReader
    from odinson_spark.pipeline.extract import triples_from_mentions
    from odinson_spark.pipeline.oneshot import extract_one_shot
    import __spark_entry__ as entrymod

    extractors, _ = RuleReader().compile_rules(entrymod.EVENT_GRAMMAR)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicate > 1:
        base = docs
        for _ in range(replicate - 1):
            docs = docs.unionByName(base)
    triples = triples_from_mentions(extract_one_shot(docs, extractors))
    return triples.count()


def _burn_probe() -> float:
    """Host-health probe: wall seconds for a fixed pure-Python loop. Healthy
    windows on this VM measure ~1.5-2 s; sustained ≥2.8 s means the
    hypervisor is throttling CPU delivery and every timing below is
    uniformly inflated (see BENCH.md) — recorded in the output so a reader
    can judge the run, never used to block it."""
    t = time.time()
    x = 0
    for i in range(30_000_000):
        x += i
    return round(time.time() - t, 2)


def _mini_burn() -> float:
    """1/10th-size health probe run immediately before every timed query —
    cheap enough (~0.15-0.2 s healthy) to annotate each measurement with
    the host state it was taken under. ≥ ~0.30 s means the hypervisor was
    throttling CPU DURING that query's window."""
    t = time.time()
    x = 0
    for i in range(3_000_000):
        x += i
    return round(time.time() - t, 3)


def _membw_probe() -> float:
    """Memory-bandwidth probe (GB/s, max over 3 short memcpy windows).

    This VM's CPU delivery and memory bandwidth throttle INDEPENDENTLY:
    measured phases show pure-Python burn at healthy speed while memcpy
    oscillates 0.02–7.7 GB/s second-to-second. Shuffle-heavy queries (the
    dedup family) are bandwidth-bound, so a CPU burn alone misses exactly
    the throttling that poisoned the BENCH_r04 dedup captures. max-of-3 is
    robust to one window landing on a sub-second stall; healthy ≈ 2–8,
    a throttled phase reads < 0.5."""
    import numpy as np

    a = np.ones(8 * 1024 * 1024 // 8)
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        n = 0
        while time.time() - t0 < 0.1:
            _ = a.copy()
            n += 1
        best = max(best, n * 8 / 1024 / (time.time() - t0))
    return round(best, 2)


# mini-burn above this = CPU-throttled window; membw below = bandwidth-throttled
HEALTH_BURN_THRESH = 0.30
HEALTH_MEMBW_THRESH = 1.0
# best-of-N above this multiple of the healthy-window reference = retry
RETRY_FACTOR = 1.3
MAX_RETRIES = 2


def _wait_healthy(max_wait: float = 10.0, membw_floor: float = 1.5) -> float:
    """Bounded wait for a healthy bandwidth phase; returns the last probe.
    Used before retries so a re-measurement lands in a good sub-window
    instead of re-rolling the same throttled phase."""
    deadline = time.time() + max_wait
    bw = _membw_probe()
    while bw < membw_floor and time.time() < deadline:
        time.sleep(0.5)
        bw = _membw_probe()
    return bw


def _load_reference(sf: float) -> dict:
    """Healthy-window per-query reference medians (capture hygiene: a query
    whose best-of-N exceeds 1.3× its reference is re-measured rather than
    committed as a phantom regression — BENCH_r04 recorded ngram 2.354 s
    that re-measured at 1.388 s on the same tree)."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks/results/bench_reference.json",
    )
    try:
        with open(path) as f:
            data = json.load(f)
        if float(data.get("sf", -1)) == float(sf):
            return data["queries"]
    except Exception:
        pass
    return {}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = 0.0  # non-numeric suffix (e.g. the ×10 'sfbig' dataset)

    from odinson_spark.session import get_spark
    import __spark_entry__ as entrymod

    burn_pre = _burn_probe()
    # fixed pre-touched heap (Xms=Xmx + AlwaysPreTouch): every heap page is
    # faulted at JVM start, so the timed queries never pay this VM's
    # serialized first-touch fault path mid-measurement (SCALE.md; measured
    # 8→32 executor efficiency 0.164 → 0.559 from this alone). PRETOUCH=0
    # opts out.
    extra_conf = {}
    if os.environ.get("PRETOUCH", "1") == "1":
        mem = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        extra_conf = {
            "spark.driver.memory": mem,
            "spark.driver.extraJavaOptions": (
                f"-XX:+AlwaysPreTouch -XX:InitialHeapSize={mem}"
            ),
        }
    spark = get_spark(app_name="odinson-bench", extra_conf=extra_conf)
    qs = entrymod.queries()
    # warm-up: spin up Python workers / JIT / codegen on the tiny SF so the
    # timings below measure steady-state throughput, not cold start
    # (both the fused and the staged extraction paths)
    run_kg_pipeline(spark, "/root/testdata/sf0.001")
    qs["pat_term"](spark, "/root/testdata/sf0.001").count()
    qs["dedup_minhash_lsh"](spark, "/root/testdata/sf0.001").count()

    def run_one(name: str) -> float:
        t0 = time.time()
        if name == "kg_pipeline":
            run_kg_pipeline(spark, sf_dir)
        else:
            qs[name](spark, sf_dir).count()
        return time.time() - t0

    timings: dict[str, float] = {}
    best_burn: dict[str, float] = {}
    best_bw: dict[str, float] = {}
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))  # host CPU delivery
    # varies run-to-run; best-of-N in INTERLEAVED rounds — a slow host
    # minute then degrades one round of every query instead of silently
    # poisoning all N repeats of whichever query it overlapped
    for _ in range(repeats):
        for name in BENCH_QUERIES:
            b = _mini_burn()
            bw = _membw_probe()
            dt = run_one(name)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
                best_burn[name] = b
                best_bw[name] = bw

    # health-gated retry: a best-of-N that was (a) taken in a throttled
    # window (CPU or bandwidth), or (b) >1.3× the healthy-window reference,
    # gets up to MAX_RETRIES extra attempts, each preceded by a bounded wait
    # for a healthy bandwidth phase — so a transient host phase during the
    # main rounds can't commit a phantom regression into the artifact
    reference = _load_reference(sf)
    health: dict[str, dict] = {}
    for name in BENCH_QUERIES:
        h = {
            "burn": best_burn[name],
            "membw": best_bw[name],
            "retries": 0,
            "flagged": False,
        }
        refv = reference.get(name)
        for _ in range(MAX_RETRIES):
            slow = refv is not None and timings[name] > RETRY_FACTOR * refv
            throttled = (
                h["burn"] > HEALTH_BURN_THRESH or h["membw"] < HEALTH_MEMBW_THRESH
            )
            if not (slow or throttled):
                break
            h["flagged"] = True
            bw = _wait_healthy()
            b = _mini_burn()
            dt = run_one(name)
            h["retries"] += 1
            if dt < timings[name]:
                timings[name] = dt
                h["burn"] = b
                h["membw"] = bw
        # final standing vs the healthy-window reference — "flagged" records
        # that retries FIRED; ref_ratio records where the kept best LANDED
        # (≤ RETRY_FACTOR means the retry recovered a healthy number)
        if refv is not None:
            h["ref_ratio"] = round(timings[name] / refv, 3)
        health[name] = h

    timings = {k: round(v, 3) for k, v in timings.items()}
    t_total = round(sum(timings.values()), 3)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    result = {
        "metric": "headline query wall time (kg extraction + dedup + ann + relational)",
        "value": t_total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs": n_docs,
        "docs_per_sec_kg": round(n_docs / timings["kg_pipeline"], 2),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "burn_pre": burn_pre,
        "burn_post": _burn_probe(),
        "membw_post": _membw_probe(),
        "health": health,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
