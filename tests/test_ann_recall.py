"""Standing recall floors for the ANN routes on CLUSTERED data.

Uniform-random vectors flatter every ANN partitioner; real embedding
corpora are clustered, which is where random IVF centroids collapse
(empty/hot Voronoi cells). These tests pin recall@10 floors on a seeded
mixture-of-Gaussians corpus (ops/ann_eval.py) so a regression in the
bucketing math or the centroid trainer shows up as a recall drop, not just
a hash mismatch. Floors are set ~0.03-0.05 below the deterministic
measured values (ivf_random 0.884, ivf_trained 0.999, lsh_noprobe 0.293,
lsh_probe 0.675 at this config — see BENCH.md for the standard-config
table)."""

import pytest

from odinson_spark.ops import ann_eval as ae
from odinson_spark.ops import similarity as sim


@pytest.fixture(scope="module")
def corpus(spark):
    vecs = ae.clustered_corpus(n=1200, dim=16, n_clusters=12, seed=5)
    df = ae.corpus_df(spark, vecs).cache()
    df.count()
    yield vecs, df
    df.unpersist()


@pytest.fixture(scope="module")
def truth(corpus):
    vecs, _ = corpus
    return ae.true_topk(vecs, k=10)


def test_ivf_trained_beats_random_centroids(corpus, truth):
    """The round-3 verdict's open quality flag: seeded-random centroids vs
    deterministic spherical k-means at EQUAL nlist/nprobe. Trained must both
    clear a high absolute floor and beat random by a real margin."""
    _, df = corpus
    random_recall = ae.recall_at_k(
        sim.ivf_ann_topk(df, k=10, dim=16, nlist=12, nprobe=3), truth
    )
    trained_recall = ae.recall_at_k(
        sim.ivf_ann_topk(df, k=10, dim=16, nlist=12, nprobe=3, train=True), truth
    )
    assert trained_recall >= 0.97
    assert trained_recall >= random_recall + 0.05
    assert random_recall >= 0.80  # random isn't broken, just worse


def test_lsh_multiprobe_uplift(corpus, truth):
    """1-bit-flip multi-probe must recover a large share of the neighbors
    that landed across exactly one hyperplane: ≥ 2× the no-probe recall on
    clustered data, with absolute floors on both."""
    _, df = corpus
    noprobe = ae.recall_at_k(
        sim.lsh_ann_topk(df, k=10, dim=16, n_planes=7, n_probes=0), truth
    )
    probed = ae.recall_at_k(sim.lsh_ann_topk(df, k=10, dim=16, n_planes=7), truth)
    assert noprobe >= 0.15
    assert probed >= 0.55
    assert probed >= noprobe + 0.2


def test_trained_centroids_deterministic(corpus):
    """Same corpus → bit-identical integer centroids (the property the
    hash-checked ann_ivf_trained gate rests on)."""
    vecs, _ = corpus
    import numpy as np

    c1 = sim.train_centroids_int(vecs, nlist=12, seed=11)
    c2 = sim.train_centroids_int(np.array(vecs, copy=True), nlist=12, seed=11)
    assert (c1 == c2).all()
    assert c1.dtype == np.int64
    assert np.abs(c1).max() <= 1000


def test_ivf_pairs_beat_lsh_pairs_at_moderate_threshold(corpus, truth):
    """Pair-mining recall at cosine >= 0.5 on clustered data: the trained-
    IVF route must recover the large majority of true pairs where the
    hyperplane-LSH route is documented to collapse."""
    import numpy as np

    vecs, df = corpus
    mat = vecs.astype(np.float64)
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    sims = np.round((mat @ mat.T) / np.outer(norms, norms), 4)
    ii, jj = np.nonzero(np.triu(sims >= 0.5, k=1))
    true_pairs = set(zip(ii.tolist(), jj.tolist()))
    assert len(true_pairs) > 100

    got = sim.embedding_cosine_pairs_ivf(
        df, threshold=0.5, dim=16, nlist=12, nprobe=3, train=True
    )
    found = {
        (int(r["vec_a"]), int(r["vec_b"]))
        for r in got.select("vec_a", "vec_b").collect()
    }
    recall = len(found & true_pairs) / len(true_pairs)
    # no false positives: recompute exact cosine for every returned pair and
    # check against the threshold with a rounding tolerance, instead of set
    # inclusion — Spark's round() is HALF_UP while np.round is banker's, so
    # a cosine landing exactly on a .00005 boundary would make the two sets
    # diverge even though both paths computed the same similarity
    for a, b in found:
        assert sims[a, b] >= 0.5 - 1e-4, (a, b, sims[a, b])
    assert recall >= 0.8


def test_lsh_two_bit_probe_uplift(corpus, truth):
    """probe_bits=2 must not lose anything vs 1-bit probing and should add
    recall on clustered data (neighbors across two hyperplanes)."""
    _, df = corpus
    one = ae.recall_at_k(sim.lsh_ann_topk(df, k=10, dim=16, n_planes=7), truth)
    two = ae.recall_at_k(
        sim.lsh_ann_topk(df, k=10, dim=16, n_planes=7, probe_bits=2), truth
    )
    assert two >= one
    assert two >= 0.8  # measured 0.675 at 1-bit on this config
