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


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    from odinson_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="odinson-bench")
    qs = entrymod.queries()
    # warm-up: spin up Python workers / JIT / codegen on the tiny SF so the
    # timings below measure steady-state throughput, not cold start
    # (both the fused and the staged extraction paths)
    run_kg_pipeline(spark, "/root/testdata/sf0.001")
    qs["pat_term"](spark, "/root/testdata/sf0.001").count()
    qs["dedup_minhash_lsh"](spark, "/root/testdata/sf0.001").count()
    timings = {}
    t_total = 0.0
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))  # host CPU delivery
    # varies run-to-run; best-of-3 is the noise floor we can afford per round
    for name in BENCH_QUERIES:
        best = None
        for _ in range(repeats):
            t0 = time.time()
            if name == "kg_pipeline":
                run_kg_pipeline(spark, sf_dir)
            else:
                qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        t_total += timings[name]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    result = {
        "metric": "headline query wall time (kg extraction + dedup + ann + relational)",
        "value": round(t_total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs": n_docs,
        "docs_per_sec_kg": round(n_docs / timings["kg_pipeline"], 2),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
