"""Materialize a larger benchmark scale by replicating the driver-provided
sf0.1 tables with remapped ids (round-3 verdict item 8: a headline less
noise-dominated than ~8 s total).

documents/embeddings are replicated ×N with ids offset per copy. Copy 0 is
verbatim; copies 1..N-1 get a seeded ~10% token-level mutation drawn from
the corpus vocabulary (round-4 verdict item 3: verbatim replication made
every content group N× bigger, so pair-emitting dedup ops measured the
corpus's quadratic duplicate structure — ngram_jaccard 116.7 s at ×10 —
not the operator; mutated copies are realistic NEAR-duplicates whose pair
count grows linearly in N). The mutation is deterministic in
(doc_id, copy): re-running the tool reproduces the corpus bit-for-bit.
The relational tables are copied as-is (the TPC-H plumbing is the codegen
baseline; its absolute time is small and join semantics would break under
naive key replication).

Usage: python tools/make_big_sf.py [out_dir] [replicate]
Defaults: /root/repo/.benchdata/sfbig, ×10 (≈ sf1).
Then: SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys
import zlib

MUTATION_RATE = 0.10
VOCAB_SIZE = 4096


def _mutate_fn(vocab: list[str], rate: float, zipf_a: float | None = None):
    """mapInPandas generator: seeded per-(doc,copy) token swaps. Tool-side
    only (corpus generation), so the per-token Python loop is acceptable;
    batches still move via Arrow.

    ``zipf_a`` — when set, replacement tokens are drawn from a SYNTHETIC
    Zipf-distributed vocabulary (``zw<k>``, P(k) ∝ k^-a) instead of the
    corpus vocabulary: rank-1 terms become stop-word-class (docFreq ≈
    corpus), deep-tail terms are naturally selective (docFreq 1..10), so
    the index cost model's scan-vs-index routing is exercised by NATURAL
    terms, not injected markers (round-5 verdict item 5)."""
    import numpy as np

    def fn(batches):
        for pdf in batches:
            texts = []
            for orig_id, copy, text in zip(
                pdf["_orig_id"], pdf["_copy"], pdf["text"]
            ):
                if copy == 0:
                    texts.append(text)
                    continue
                toks = text.split(" ")
                seed = zlib.crc32(f"{int(orig_id)}:{int(copy)}".encode()) & 0x7FFFFFFF
                rng = np.random.RandomState(seed)
                hit = np.nonzero(rng.random_sample(len(toks)) < rate)[0]
                if zipf_a is not None:
                    ranks = rng.zipf(zipf_a, size=len(hit))
                    for i, r in zip(hit, ranks):
                        toks[i] = f"zw{int(r)}"
                else:
                    repl = rng.randint(0, len(vocab), size=len(hit))
                    for i, r in zip(hit, repl):
                        toks[i] = vocab[r]
                texts.append(" ".join(toks))
            pdf = pdf.copy()
            pdf["text"] = texts
            pdf["n_chars"] = [len(t) for t in texts]
            # explicit column order = output schema order (positional match)
            yield pdf[[c for c in pdf.columns if c != "_orig_id"]]

    return fn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".benchdata/sfbig")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # optional third arg: zipf exponent for a synthetic skewed vocabulary
    # (e.g. 1.3); default keeps the uniform corpus-vocab mutation
    zipf_a = float(sys.argv[3]) if len(sys.argv) > 3 else None

    from pyspark.sql import functions as F
    from odinson_spark.session import get_spark

    spark = get_spark(app_name="make-big-sf", master="local[8]", shuffle_partitions=8)
    os.makedirs(out, exist_ok=True)

    copies = spark.range(n).withColumnRenamed("id", "_copy")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.count()
    # corpus vocabulary for the mutation draw: top-VOCAB_SIZE tokens by
    # frequency, ties broken lexicographically — deterministic
    vocab = [
        r["tok"]
        for r in (
            docs.select(F.explode(F.split("text", " ")).alias("tok"))
            .groupBy("tok")
            .count()
            .orderBy(F.desc("count"), F.asc("tok"))
            .limit(VOCAB_SIZE)
            .collect()
        )
    ]
    # stride by max_id + 1, not row count: sparse or non-0-based ids would
    # otherwise collide across copies
    doc_stride = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    # repartition BEFORE the mutation: the source is one small file, so the
    # cross join inherits a single partition and the per-token mutation UDF
    # would otherwise run as one task regardless of replication factor
    # (observed: ×1000 pinned one core for >5 min while 31 idled)
    n_parts = max(32, min(256, n * n_docs // 50000))
    big_docs = (
        docs.crossJoin(copies)
        .withColumn("_orig_id", F.col("doc_id"))
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * doc_stride)
        .repartition(n_parts)
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in docs.schema.fields
    ) + ", _copy bigint"
    (
        big_docs.mapInPandas(_mutate_fn(vocab, MUTATION_RATE, zipf_a), schema=out_schema)
        .drop("_copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_emb = emb.count()
    vec_stride = int(emb.agg(F.max("vec_id")).first()[0]) + 1
    (
        emb.crossJoin(copies)
        .withColumn("vec_id", F.col("vec_id") + F.col("_copy") * vec_stride)
        .drop("_copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )

    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events",
    ):
        src = f"{SRC}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if os.path.exists(src):
            if os.path.exists(dst):
                shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    print(f"wrote ×{n} documents ({n_docs * n}) + embeddings ({n_emb * n}) to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
