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


def derive_nlist(
    n_vectors: int, target_cell_size: int = 1024, max_nlist: int = 256
) -> int:
    """Cell count scaled to the corpus: ≈ N / target_cell_size, clamped to
    [2, max_nlist].

    The coarse quantizer is inlined into the plan as literal centroid
    expressions, so nlist must stay modest (plan size grows linearly with
    it).  Past ``max_nlist`` cells the right scale move is hierarchical:
    compose the IVF cell with an LSH bucket prefix
    (``struct(add_lsh_bucket(...).bucket, cell)``) so the join key space is
    the PRODUCT of the two partitioners — 256 cells × 2^30 LSH buckets
    comfortably shards 10^12 vectors at ~4k/key without a single giant
    centroid table."""
    n = max(int(n_vectors), 2)
    return max(2, min(max_nlist, math.ceil(n / max(target_cell_size, 1))))


def _centroids_int(dim: int, nlist: int, seed: int) -> np.ndarray:
    """Seeded integer centroids in [-1000, 1000] — the same reproducibility
    trick as :func:`_hyperplanes_int`: exactly representable in double and
    inlineable as SQL literals, so Spark and DuckDB assign byte-identical
    cells."""
    rng = np.random.RandomState(seed)
    return rng.randint(-1000, 1001, size=(nlist, dim)).astype(np.int64)


def _cell_rank_array(emb_col, centroids: np.ndarray):
    """array<struct<nd,long idx,int>> sorted by quantized dot DESC, centroid
    index ASC — element 1 is the assignment cell, the first ``nprobe``
    elements are the probe cells.  Pure Catalyst (zip_with/aggregate/
    array_sort), stays in whole-stage codegen."""
    entries = []
    for c in range(len(centroids)):
        cent_arr = F.array(*[F.lit(int(w)) for w in centroids[c]])
        prods = F.zip_with(
            emb_col,
            cent_arr,
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(float(_QUANT))
            ).cast("long"),
        )
        dot = F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)
        entries.append(F.struct((-dot).alias("nd"), F.lit(c).alias("idx")))
    return F.array_sort(F.array(*entries))


def ivf_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    dim: int = 64,
    nlist: int | None = None,
    nprobe: int = 3,
    seed: int = 11,
    max_cell_size: int = 100_000,
    target_cell_size: int = 1024,
    lsh_prefix_planes: int = 0,
) -> DataFrame:
    """Approximate top-k via an IVF-Flat coarse quantizer: every vector is
    assigned to its nearest (max quantized dot) of ``nlist`` seeded
    centroids; each query scores only candidates in its ``nprobe`` nearest
    cells.

    Complements :func:`lsh_ann_topk`: IVF adapts to the data direction
    structure a bit better than random hyperplanes at equal bucket counts
    (cells are Voronoi regions, not axis-ish half-space intersections) and
    ``nprobe`` gives a smooth recall/cost dial without the 2^planes bucket
    explosion.

    Scale shape: assignment is per-row (narrow, zero shuffle); the only
    shuffles are the cell equi-join and the final top-k window, both keyed
    to ≤ ``max_cell_size`` rows per key.  Each candidate lives in exactly
    one cell and probe cells are distinct, so no pair is scored twice.
    Over-cap cells are dropped deterministically and LOGGED (never silent);
    ``nlist=None`` derives the cell count from corpus size
    (:func:`derive_nlist`).

    ``lsh_prefix_planes > 0`` turns on the hierarchical trillion-row shard:
    the join key becomes ``lsh_bucket * nlist + cell``, multiplying the key
    space (2^planes × nlist) without growing the inlined centroid set.
    Candidates must then share the hyperplane bucket too — recall narrows
    to near-duplicates the prefix keeps together, which is exactly the
    regime where 10^12-row ANN is used (the prefix planes are seeded at
    ``seed + 1`` so they are independent of the centroids)."""
    if nlist is None:
        nlist = derive_nlist(embeddings.count(), target_cell_size)
        logger.info("ivf_ann_topk: derived nlist=%d", nlist)
    nprobe = min(nprobe, nlist)
    centroids = _centroids_int(dim, nlist, seed)
    ranked_cells = embeddings.withColumn(
        "_cells", _cell_rank_array(F.col("embedding"), centroids)
    )
    if lsh_prefix_planes > 0:
        planes = _hyperplanes_int(dim, lsh_prefix_planes, seed + 1)
        prefix = _bucket_column(F.col("embedding"), planes) * F.lit(nlist)
    else:
        prefix = F.lit(0).cast("long")
    ranked_cells = ranked_cells.withColumn("_prefix", prefix)
    base = ranked_cells.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").cast("array<double>").alias("vb"),
        (F.col("_prefix") + F.element_at("_cells", 1)["idx"]).alias("cell"),
    )
    base = _cap_buckets(base, max_cell_size, "ivf_ann_topk", key="cell")
    probes = ranked_cells.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("va"),
        F.col("_prefix"),
        F.explode(F.slice("_cells", 1, nprobe)["idx"]).alias("_probe_cell"),
    ).select(
        "query_id",
        "va",
        (F.col("_prefix") + F.col("_probe_cell")).alias("cell"),
    )
    cos = F.round(_cosine_col(F.col("va"), F.col("vb")), 4)
    scored = (
        probes.join(base, "cell")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def ivf_ann_oracle_sql(
    table: str = "embeddings",
    k: int = 5,
    dim: int = 64,
    nlist: int = 8,
    nprobe: int = 3,
    seed: int = 11,
    max_cell_size: int = 100_000,
    lsh_prefix_planes: int = 0,
) -> str:
    """DuckDB SQL computing the identical IVF result: centroids inlined as
    VALUES, quantized integer dots make cell assignment engine-independent,
    ties broken by centroid index on both sides.  ``lsh_prefix_planes > 0``
    mirrors the hierarchical shard: the key is ``bucket * nlist + cell``
    with the prefix planes seeded at ``seed + 1``, exactly as the Spark
    side."""
    nprobe = min(nprobe, nlist)
    cents = _centroids_int(dim, nlist, seed)
    values = ", ".join(
        f"({c}, {i + 1}, {int(cents[c][i])})" for c in range(nlist) for i in range(dim)
    )
    if lsh_prefix_planes > 0:
        planes = _hyperplanes_int(dim, lsh_prefix_planes, seed + 1)
        pvalues = ", ".join(
            f"({p}, {i + 1}, {int(planes[p][i])})"
            for p in range(lsh_prefix_planes)
            for i in range(dim)
        )
        prefix_ctes = f"""
planes(p, i, w) AS (VALUES {pvalues}),
pdots AS (
  SELECT e.vec_id, pl.p,
         sum(CAST(floor(e.embedding[pl.i]::DOUBLE * pl.w::DOUBLE * {float(_QUANT)}) AS BIGINT)) AS dot
  FROM {table} e, planes pl GROUP BY e.vec_id, pl.p
),
prefixes AS (
  SELECT vec_id,
         sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) * {nlist} AS prefix
  FROM pdots GROUP BY vec_id
),"""
    else:
        prefix_ctes = f"""
prefixes AS (SELECT vec_id, 0::BIGINT AS prefix FROM {table}),"""
    return f"""
WITH cents(c, i, w) AS (VALUES {values}),{prefix_ctes}
dots AS (
  SELECT e.vec_id, ct.c,
         sum(CAST(floor(e.embedding[ct.i]::DOUBLE * ct.w::DOUBLE * {float(_QUANT)}) AS BIGINT)) AS dot
  FROM {table} e, cents ct GROUP BY e.vec_id, ct.c
),
ranked_cells AS (
  SELECT d.vec_id, px.prefix + d.c AS cell,
         row_number() OVER (PARTITION BY d.vec_id ORDER BY d.dot DESC, d.c ASC) AS rn
  FROM dots d JOIN prefixes px ON px.vec_id = d.vec_id
),
base0 AS (SELECT vec_id, cell FROM ranked_cells WHERE rn = 1),
counts AS (SELECT cell, count(*) AS n FROM base0 GROUP BY cell),
base AS (
  SELECT b.vec_id, b.cell FROM base0 b
  JOIN counts c ON b.cell = c.cell WHERE c.n <= {max_cell_size}
),
probes AS (SELECT vec_id AS query_id, cell FROM ranked_cells WHERE rn <= {nprobe}),
cand AS (
  SELECT p.query_id, c.vec_id AS nbr_id
  FROM probes p JOIN base c ON p.cell = c.cell AND p.query_id <> c.vec_id
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
