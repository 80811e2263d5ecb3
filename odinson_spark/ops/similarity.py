"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk` — brute-force exact top-k, entirely JVM-side
  (``zip_with``/``aggregate`` + a rank window). The correctness baseline.
* :func:`lsh_ann_topk` — random-hyperplane LSH bucketing with 1-bit-flip
  multi-probe: queries only score against vectors sharing a (probed) hash
  bucket. The scale path: at 10^12 vectors the bucket equi-join replaces the
  cross join — shuffle-partitionable, no corpus broadcast — and recall is
  tunable via n_planes/n_probes.

Reproducibility design: hyperplane weights are seeded INTEGERS and the
per-dimension products are quantized with ``floor(x * w * 65536)`` before
summing — integer addition is order-independent, and scaling by a power of
two is exact in IEEE double, so Spark and DuckDB compute byte-identical
bucket ids. That turns the LSH ANN from a rows-only check into a fully
hash-checked gate (the oracle inlines the plane matrix as SQL literals).
"""

from __future__ import annotations

import logging
import math

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _cosine_col

_QUANT = 65536  # power of two: scaling is exact in IEEE double

logger = logging.getLogger(__name__)


def derive_n_planes(n_vectors: int, target_bucket_size: int = 1024) -> int:
    """Plane count scaled to the corpus: ≈ log2(N / target_bucket_size),
    clamped to [4, 30].

    A fixed plane count is a toy default — 10 planes is 1024 buckets total,
    so at 10^12 vectors EVERY bucket exceeds any per-bucket cap and the ANN
    goes empty. Deriving from N keeps expected bucket occupancy near
    ``target_bucket_size`` at every scale (30 planes ≈ 10^9 buckets covers
    10^12 vectors at ~1k/bucket)."""
    n = max(int(n_vectors), 2)
    return max(4, min(30, math.ceil(math.log2(n / max(target_bucket_size, 1)))))


def _cap_buckets(base: DataFrame, max_bucket_size: int, op_name: str, key: str = "bucket"):
    """Drop over-cap buckets — but never silently: the dropped bucket ids and
    sizes are logged (the counts side is tiny, ≤ one row per bucket, and is
    persisted so the logging action and the join share one scan)."""
    counts = base.groupBy(key).agg(F.count(F.lit(1)).alias("_n")).persist()
    dropped = counts.filter(F.col("_n") > max_bucket_size).collect()
    if dropped:
        total = sum(r["_n"] for r in dropped)
        logger.warning(
            "%s: dropping %d over-cap bucket(s) holding %d vectors "
            "(max_bucket_size=%d): %s%s — raise max_bucket_size or n_planes "
            "to keep them",
            op_name,
            len(dropped),
            total,
            max_bucket_size,
            [(r[key], r["_n"]) for r in dropped[:10]],
            "…" if len(dropped) > 10 else "",
        )
    return base.join(counts, key).filter(F.col("_n") <= max_bucket_size).drop("_n")


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


def _hyperplanes_int(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Seeded integer hyperplane weights in [-1000, 1000] — random directions
    (sign test only cares about direction), exactly representable in double,
    and inlineable as SQL literals."""
    rng = np.random.RandomState(seed)
    return rng.randint(-1000, 1001, size=(n_planes, dim)).astype(np.int64)


def _bucket_column(emb_col, planes: np.ndarray):
    """bucket = Σ_p (dot_p > 0) << p, with dot_p computed as a sum of
    floor-quantized per-dimension products. Pure Catalyst expressions —
    stays in whole-stage codegen, no Python worker."""
    n_planes = len(planes)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane_arr = F.array(*[F.lit(int(w)) for w in planes[p]])
        prods = F.zip_with(
            emb_col,
            plane_arr,
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(float(_QUANT))
            ).cast("long"),
        )
        dot = F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast(
            "long"
        )
    return bucket


def add_lsh_bucket(
    embeddings: DataFrame, dim: int, n_planes: int = 12, seed: int = 7
) -> DataFrame:
    planes = _hyperplanes_int(dim, n_planes, seed)
    return embeddings.withColumn("bucket", _bucket_column(F.col("embedding"), planes))


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int | None = None,
    seed: int = 7,
    n_probes: int | None = None,
    max_bucket_size: int = 100_000,
    target_bucket_size: int = 1024,
) -> DataFrame:
    """Approximate top-k with hyperplane LSH + 1-bit-flip multi-probe.

    Each query probes its own bucket plus ``n_probes`` (default: all
    ``n_planes``) single-bit-flip neighbor buckets, recovering near-misses
    that landed on the other side of exactly one hyperplane. Probe buckets
    are distinct values and every candidate lives in exactly one bucket, so
    no (query, nbr) pair is scored twice — no distinct needed.

    ``n_planes=None`` (default) derives the plane count from the corpus size
    (:func:`derive_n_planes`) so bucket occupancy stays near
    ``target_bucket_size`` at any scale; pass it explicitly for
    reproducibility against a fixed oracle.

    Skew guard: candidate buckets above ``max_bucket_size`` are dropped
    deterministically and LOGGED with their sizes (never silent)."""
    if n_planes is None:
        n_planes = derive_n_planes(embeddings.count(), target_bucket_size)
        logger.info("lsh_ann_topk: derived n_planes=%d", n_planes)
    if n_probes is None:
        n_probes = n_planes
    b = add_lsh_bucket(embeddings, dim, n_planes, seed)
    base = b.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").cast("array<double>").alias("vb"),
        "bucket",
    )
    base = _cap_buckets(base, max_bucket_size, "lsh_ann_topk")
    probes = b.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("va"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_probes)],
            )
        ).alias("bucket"),
    )
    cos = F.round(_cosine_col(F.col("va"), F.col("vb")), 4)
    scored = (
        probes.join(base, "bucket")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def lsh_ann_oracle_sql(
    table: str = "embeddings",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 10,
    seed: int = 7,
    n_probes: int | None = None,
    max_bucket_size: int = 100_000,
) -> str:
    """DuckDB SQL computing the identical ANN result: the seeded integer
    plane matrix is inlined as VALUES (the minhash_lsh_oracle_sql trick), the
    quantized dot products make bucket ids engine-independent."""
    if n_probes is None:
        n_probes = n_planes
    planes = _hyperplanes_int(dim, n_planes, seed)
    values = ", ".join(
        f"({p}, {i + 1}, {int(planes[p][i])})"
        for p in range(n_planes)
        for i in range(dim)
    )
    return f"""
WITH planes(p, i, w) AS (VALUES {values}),
dots AS (
  SELECT e.vec_id, pl.p,
         sum(CAST(floor(e.embedding[pl.i]::DOUBLE * pl.w::DOUBLE * {float(_QUANT)}) AS BIGINT)) AS dot
  FROM {table} e, planes pl GROUP BY e.vec_id, pl.p
),
buckets AS (
  SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id
),
counts AS (SELECT bucket, count(*) AS n FROM buckets GROUP BY bucket),
base AS (
  SELECT b.vec_id, b.bucket FROM buckets b
  JOIN counts c ON b.bucket = c.bucket WHERE c.n <= {max_bucket_size}
),
probes AS (
  SELECT b.vec_id AS query_id,
         CASE WHEN g.g = -1 THEN b.bucket
              ELSE xor(b.bucket, (1::BIGINT << g.g)) END AS bucket
  FROM buckets b, (SELECT unnest(generate_series(-1, {n_probes - 1})) AS g) g
),
cand AS (
  SELECT p.query_id, c.vec_id AS nbr_id
  FROM probes p JOIN base c ON p.bucket = c.bucket AND p.query_id <> c.vec_id
),
scored AS (
  SELECT cand.query_id, cand.nbr_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]), 4) AS cosine
  FROM cand
  JOIN {table} q ON q.vec_id = cand.query_id
  JOIN {table} n ON n.vec_id = cand.nbr_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rank
  FROM scored
)
SELECT query_id, nbr_id, cosine, rank::INT AS rank FROM ranked WHERE rank <= {k}
"""
