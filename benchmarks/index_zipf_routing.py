"""Cost-model routing on a NATURAL skewed vocabulary (round-5 verdict
item 5): build a TermIndex over the Zipf-mutated corpus
(tools/make_big_sf.py <out> <n> <zipf_a>) and record, for terms across the
docFreq spectrum, which route the planner picks (index candidate join vs
prefiltered scan) and what each path actually costs — no injected markers.

Usage: python benchmarks/index_zipf_routing.py [zipf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".benchdata/sfzipf100"
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "benchmarks/results/index_zipf_routing_r6.json"
    )
    base = os.path.join(REPO, ".benchdata", "idxzipf_" + os.path.basename(sf_dir.rstrip("/")))
    os.makedirs(base, exist_ok=True)

    from pyspark.sql import functions as F

    from odinson_spark.index import TermIndex
    from odinson_spark.pipeline.extract import tokenize_documents
    from odinson_spark.search import SearchEngine
    from odinson_spark.session import get_spark

    spark = get_spark(app_name="index-zipf-routing", extra_conf={"spark.driver.memory": "24g"})
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    idx_path = os.path.join(base, "index")
    t0 = time.time()
    if not os.path.exists(os.path.join(idx_path, "odinson_index_meta.json")):
        idx = TermIndex.build(tokenize_documents(docs), idx_path)
    else:
        idx = TermIndex.read(spark, idx_path)
    t_build = round(time.time() - t0, 1)

    # pick natural probe terms across the docFreq spectrum from the stats
    # table itself (zw<k> = synthetic Zipf vocabulary)
    zstats = (
        idx.stats.filter((F.col("field") == "norm") & F.col("term").startswith("zw"))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    picks = {}
    for label, lo, hi in [
        ("head", 100_000, 1 << 60),
        ("mid", 2_000, 6_000),
        ("rare", 20, 60),
        ("tail", 1, 2),
    ]:
        r = (
            zstats.filter((F.col("df") >= lo) & (F.col("df") <= hi))
            .orderBy("term")
            .limit(1)
            .collect()
        )
        if r:
            picks[label] = (r[0]["term"], int(r[0]["df"]))

    eng_idx = idx.engine()
    scan_eng = SearchEngine(idx.live_sentences())
    results = {"build_s": t_build, "n_docs": docs.count(), "terms": {}}
    # warm both paths
    eng_idx.mentions(picks["rare"][0]).count()
    scan_eng.mentions(picks["rare"][0]).count()
    for label, (term, df) in picks.items():
        info = eng_idx.explain(term)
        t0 = time.time()
        n_i = eng_idx.mentions(term).count()
        t_i = round(time.time() - t0, 2)
        t0 = time.time()
        n_s = scan_eng.mentions(term).count()
        t_s = round(time.time() - t0, 2)
        assert n_i == n_s, (term, n_i, n_s)
        results["terms"][label] = {
            "term": term,
            "df": df,
            "route": info["route"],
            "estimated_candidates": info["estimated_candidates"],
            "mentions": n_i,
            "index_s": t_i,
            "scan_s": t_s,
        }
        print(label, results["terms"][label])
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_json)
    spark.stop()


if __name__ == "__main__":
    main()
