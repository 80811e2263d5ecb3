"""Extra benchmarks for the optimization rounds (bench.py is frozen).

Usage:
    python bench_extra.py time  <sf_dir> [query ...]   # noop-sink wall times
    python bench_extra.py plan  <sf_dir> <out_dir> [query ...]  # explain(formatted)

`time` isolates each query with the noop sink (guide §1.4) so the
computation is timed, not the sink; jobs are labelled (guide §1.5).
`plan` writes plans/<query>.txt with .explain("formatted") output.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    mode = sys.argv[1]
    sf_dir = sys.argv[2]
    if mode == "plan":
        out_dir = sys.argv[3]
        names = sys.argv[4:]
        os.makedirs(out_dir, exist_ok=True)
    else:
        out_dir = None
        names = sys.argv[3:]

    from odinson_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="odinson-bench-extra")
    qs = dict(entrymod.queries())

    def _kg(s, d):
        from odinson_spark.lang.rules import RuleReader
        from odinson_spark.pipeline.extract import triples_from_mentions
        from odinson_spark.pipeline.oneshot import extract_one_shot

        extractors, _ = RuleReader().compile_rules(entrymod.EVENT_GRAMMAR)
        docs = s.read.parquet(f"{d}/documents.parquet")
        return triples_from_mentions(extract_one_shot(docs, extractors))

    qs["kg_pipeline"] = _kg
    if not names:
        names = ["kg_pipeline", "pat_quant_greedy", "graph_kleene",
                 "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
                 "ann_topk", "text_quality", "tpch_q1", "tpch_join"]

    if mode == "plan":
        import contextlib
        import io

        for name in names:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {out_dir}/{name}.txt")
        spark.stop()
        return

    # warm-up (python workers / codegen) on the tiny SF
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:
            print(f"warmup {name} failed: {e}", file=sys.stderr)

    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))
    timings: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": sf_dir,
        "repeats": repeats,
        "times": timings,
        "best": {n: min(v) for n, v in timings.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
