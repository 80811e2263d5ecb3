"""Single-process matcher floor profiler (no Spark).

Replicates the body of the fused one-shot stage
(odinson_spark/pipeline/oneshot.py:fn) over the sf documents table on ONE
core, under cProfile, and prints the top cumulative-time functions per
stage.  This is the per-core ceiling that bounds cluster throughput: at
1000 executors the wall clock is (docs / (cores × docs_per_sec_here)) —
optimizing here moves every deployment.

Usage: python benchmarks/profile_floor.py [sf_dir] [top_n]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    import __spark_entry__ as entrymod
    from odinson_spark.lang.rules import RuleReader
    from odinson_spark.match.extractor import BatchExtractor
    from odinson_spark.pipeline.extract import _fields_used, _mention_frame
    from odinson_spark.match.matches import EventMatch
    from odinson_spark.testing import sentence_batch_from_docs
    from odinson_spark.tokenizer.code_tokenizer import annotate_text, content_sha

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    extractors, _ = RuleReader().compile_rules(entrymod.EVENT_GRAMMAR)
    need_inout = bool(
        _fields_used([e.program for e in extractors]) & {"incoming", "outgoing"}
    )
    runner = BatchExtractor(extractors)

    def annotate_stage():
        sents, doc_ids, sent_ids, shas = [], [], [], []
        for doc_id, text in docs:
            sha = content_sha(text or "")
            for s in annotate_text(text or "", 100):
                sents.append(s)
                doc_ids.append(str(doc_id))
                sent_ids.append(s["sent_id"])
                shas.append(sha)
        return sents, doc_ids, sent_ids, shas

    def batch_stage(sents):
        return sentence_batch_from_docs(
            sents, build_inout=need_inout, pre_normalized=True
        )

    def match_stage(batch, doc_ids, sent_ids, shas):
        mentions = runner.extract_no_state(batch, doc_ids, sent_ids)
        idx = {(doc_ids[i], sent_ids[i]): i for i in range(len(doc_ids))}
        return _mention_frame(mentions, idx, batch.raw_layers["raw"], shas, EventMatch)

    profiling = os.environ.get("PROFILE", "1") != "0"
    repeats = 1 if profiling else int(os.environ.get("REPEATS", "3"))
    prof = cProfile.Profile()
    best = None
    for _ in range(repeats):
        stages = {}
        t0 = time.time()
        if profiling:
            prof.enable()
        sents, doc_ids, sent_ids, shas = annotate_stage()
        if profiling:
            prof.disable()
        stages["annotate"] = time.time() - t0

        t0 = time.time()
        if profiling:
            prof.enable()
        batch = batch_stage(sents)
        if profiling:
            prof.disable()
        stages["batch_build"] = time.time() - t0

        t0 = time.time()
        if profiling:
            prof.enable()
        frame = match_stage(batch, doc_ids, sent_ids, shas)
        if profiling:
            prof.disable()
        stages["match"] = time.time() - t0
        if best is None or sum(stages.values()) < sum(best.values()):
            best = stages

    total = sum(best.values())
    print(f"docs={len(docs)} sentences={len(sents)} mentions={len(frame)}")
    for k, v in best.items():
        print(f"{k:12s} {v:7.3f} s")
    print(f"{'total':12s} {total:7.3f} s  ({len(docs) / total:,.0f} docs/s/core)")

    if profiling:
        buf = io.StringIO()
        pstats.Stats(prof, stream=buf).sort_stats("cumulative").print_stats(top_n)
        print(buf.getvalue())


if __name__ == "__main__":
    main()
