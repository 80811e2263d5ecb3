"""Recall evaluation for the ANN routes on CLUSTERED data.

Uniform-random vectors are the easiest possible ANN workload (neighbors are
far apart, any partitioner separates them) and flatter both LSH and IVF.
Real embedding corpora are clustered, which is exactly where random IVF
centroids collapse: most Voronoi cells go empty, a few go hot, and recall
at fixed nprobe craters. This module provides the seeded
mixture-of-Gaussians corpus and the recall@k computation that
tests/test_ann_recall.py asserts floors on and benchmarks/ann_recall.py
logs into BENCH.md — recall on clustered data is a standing metric, not a
one-off experiment.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pyspark.sql import DataFrame


def clustered_corpus(
    n: int = 2000,
    dim: int = 32,
    n_clusters: int = 20,
    noise: float = 0.15,
    seed: int = 5,
) -> np.ndarray:
    """Seeded mixture of Gaussians on the unit sphere: ``n_clusters`` random
    unit centers, each vector a center plus isotropic noise. Deterministic
    float32 output (the dtype the embeddings tables use)."""
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.sqrt(np.einsum("ij,ij->i", centers, centers))[:, None]
    assign = rng.randint(n_clusters, size=n)
    vecs = centers[assign] + noise * rng.normal(size=(n, dim))
    return vecs.astype(np.float32)


def true_topk(vecs: np.ndarray, k: int = 10) -> Dict[int, set]:
    """Exact cosine top-k neighbor ids per vector (self excluded), numpy
    brute force — the ground truth the ANN routes are scored against."""
    mat = vecs.astype(np.float64)
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    sims = (mat @ mat.T) / np.outer(norms, norms)
    np.fill_diagonal(sims, -np.inf)
    # argsort descending; ties broken by lower id (stable sort on -sims)
    order = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    return {i: set(order[i].tolist()) for i in range(len(mat))}


def recall_at_k(ann_result: DataFrame, truth: Dict[int, set], k: int = 10) -> float:
    """Mean |ANN top-k ∩ true top-k| / k over all queries in ``truth``
    (queries the ANN returned nothing for count as zero recall — a route
    that drops queries must pay for it)."""
    got: Dict[int, set] = {}
    for row in ann_result.select("query_id", "nbr_id").collect():
        got.setdefault(int(row["query_id"]), set()).add(int(row["nbr_id"]))
    total = 0.0
    for q, t in truth.items():
        total += len(got.get(q, set()) & t) / float(k)
    return total / max(len(truth), 1)


def corpus_df(spark, vecs: np.ndarray) -> DataFrame:
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, schema)
