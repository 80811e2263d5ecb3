"""Materialize a larger benchmark scale by replicating the driver-provided
sf0.1 tables with remapped ids (round-3 verdict item 8: a headline less
noise-dominated than ~8 s total).

documents/embeddings are replicated ×N with ids offset per copy (so dedup /
ANN / extraction see distinct rows, not N exact copies of one key space —
except text content, which repeats by construction: that only makes the
dedup ops work HARDER, every content group is N× bigger). The relational
tables are copied as-is (the TPC-H plumbing is the codegen baseline; its
absolute time is small and join semantics would break under naive key
replication).

Usage: python tools/make_big_sf.py [out_dir] [replicate]
Defaults: /root/repo/.benchdata/sfbig, ×10 (≈ sf1).
Then: SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".benchdata/sfbig")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F
    from odinson_spark.session import get_spark

    spark = get_spark(app_name="make-big-sf", master="local[8]", shuffle_partitions=8)
    os.makedirs(out, exist_ok=True)

    copies = spark.range(n).withColumnRenamed("id", "_copy")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.count()
    # stride by max_id + 1, not row count: sparse or non-0-based ids would
    # otherwise collide across copies
    doc_stride = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    (
        docs.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * doc_stride)
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
