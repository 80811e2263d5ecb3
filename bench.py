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


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = 0.0  # non-numeric suffix (e.g. the ×10 'sfbig' dataset)

    from odinson_spark.session import get_spark
    import __spark_entry__ as entrymod

    burn_pre = _burn_probe()
    spark = get_spark(app_name="odinson-bench")
    qs = entrymod.queries()
    # warm-up: spin up Python workers / JIT / codegen on the tiny SF so the
    # timings below measure steady-state throughput, not cold start
    # (both the fused and the staged extraction paths)
    run_kg_pipeline(spark, "/root/testdata/sf0.001")
    qs["pat_term"](spark, "/root/testdata/sf0.001").count()
    qs["dedup_minhash_lsh"](spark, "/root/testdata/sf0.001").count()
    timings = {}
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))  # host CPU delivery
    # varies run-to-run; best-of-N in INTERLEAVED rounds — a slow host
    # minute then degrades one round of every query instead of silently
    # poisoning all N repeats of whichever query it overlapped
    for _ in range(repeats):
        for name in BENCH_QUERIES:
            t0 = time.time()
            if name == "kg_pipeline":
                run_kg_pipeline(spark, sf_dir)
            else:
                qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = dt
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
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
