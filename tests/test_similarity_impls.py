"""Equivalence tests for the ANN implementation variants: the vectorized
Arrow cell assignment must be BIT-identical to the interpreted Catalyst
expression (same quantized integer arithmetic), and a queries= subset must
return exactly the self-join's rows for those ids."""

import pytest
from pyspark.sql import functions as F

from odinson_spark.ops import ann_eval as ae
from odinson_spark.ops import similarity as sim


@pytest.fixture(scope="module")
def corpus(spark):
    vecs = ae.clustered_corpus(n=400, dim=16, n_clusters=8, seed=9)
    df = ae.corpus_df(spark, vecs).cache()
    df.count()
    yield df
    df.unpersist()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ivf_catalyst_and_pandas_assignments_identical(corpus):
    a = sim.ivf_ann_topk(corpus, k=5, dim=16, nlist=8, nprobe=3, impl="catalyst")
    b = sim.ivf_ann_topk(corpus, k=5, dim=16, nlist=8, nprobe=3, impl="pandas")
    ra, rb = _rows(a), _rows(b)
    assert ra and ra == rb


def test_ivf_auto_routes_by_budget():
    # the budget boundary: gate shape (8×64=512) stays Catalyst; anything
    # bigger must route to the Arrow path
    assert 8 * 64 <= sim._CATALYST_CELL_BUDGET
    assert 196 * 8 > sim._CATALYST_CELL_BUDGET


def test_lsh_queries_subset_matches_self_join(corpus):
    full = sim.lsh_ann_topk(corpus, k=5, dim=16, n_planes=6)
    qs = corpus.filter(F.col("vec_id") < 20)
    sub = sim.lsh_ann_topk(corpus, k=5, dim=16, n_planes=6, queries=qs)
    assert _rows(sub) == _rows(full.filter(F.col("query_id") < 20))


def test_ivf_queries_subset_matches_self_join(corpus):
    full = sim.ivf_ann_topk(corpus, k=5, dim=16, nlist=8, nprobe=3)
    qs = corpus.filter(F.col("vec_id") < 20)
    sub = sim.ivf_ann_topk(corpus, k=5, dim=16, nlist=8, nprobe=3, queries=qs)
    assert _rows(sub) == _rows(full.filter(F.col("query_id") < 20))


def test_ivf_queries_subset_matches_self_join_with_prefix(corpus):
    full = sim.ivf_ann_topk(
        corpus, k=5, dim=16, nlist=8, nprobe=3, lsh_prefix_planes=4
    )
    qs = corpus.filter(F.col("vec_id") < 20)
    sub = sim.ivf_ann_topk(
        corpus, k=5, dim=16, nlist=8, nprobe=3, lsh_prefix_planes=4, queries=qs
    )
    assert _rows(sub) == _rows(full.filter(F.col("query_id") < 20))
