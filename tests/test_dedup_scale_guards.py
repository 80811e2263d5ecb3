"""Scale guards on the dedup/LSH joins: hot buckets must not go quadratic,
and the simhash pairing stage must be lossless under its banding guarantee."""

import pytest
from pyspark.sql import functions as F

from odinson_spark.ops.dedup import minhash_lsh_pairs, simhash_pairs, simhash_signatures


def test_minhash_lsh_hot_bucket_is_bounded(spark):
    # 1000 identical docs: uncapped banding would emit 1000*999/2 = 499500
    # pairs per band; with the star fallback the output is exactly n-1 pairs,
    # and dedup connectivity (one component) is preserved.
    n = 1000
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated everywhere") for i in range(n)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, max_bucket_size=64).collect()
    assert len(pairs) == n - 1
    assert all(r.doc_a == 0 for r in pairs)  # star centered at min doc_id
    assert {r.doc_b for r in pairs} == set(range(1, n))


def test_minhash_lsh_small_buckets_unchanged(spark):
    # below the cap the result is the classic all-pairs band join
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "alpha beta gamma delta"),
            (4, "totally different text here"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs).collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_simhash_pairs_finds_planted_near_dups(spark):
    base = "spark catalyst optimizer pushes filters into the parquet scan layer"
    rows = [
        (1, base),
        (2, base),  # identical -> hamming 0
        (3, base.replace("parquet", "iceberg")),  # one token changed -> small hamming
        (4, "completely unrelated words about cooking pasta tonight with basil"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(docs, bands=15, max_hamming=12).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 12
    assert not any(4 in p for p in pairs)


def test_simhash_pairs_banding_is_lossless(spark):
    # ground truth: quadratic join over signatures; the banded join must
    # reproduce it exactly when max_hamming < bands
    import random

    rng = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(12))) for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(docs, bands=4, max_hamming=3).collect()
    }
    sig = simhash_signatures(docs)
    a = sig.alias("a")
    b = sig.alias("b")
    truth = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert got == truth


def test_simhash_pairs_rejects_lossy_params(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(AssertionError):
        simhash_pairs(docs, bands=4, max_hamming=4)


# ---------------------------------------------------------------------------
# scale-safe hyperplane-LSH defaults (round-2 VERDICT: fixed plane counts +
# silent over-cap drops would empty the ANN at true scale)
# ---------------------------------------------------------------------------


def _clustered_embeddings(spark, n=300, dim=8):
    """n vectors in one tight cone: with too few planes they all share a
    bucket."""
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(dim)
    rows = []
    for i in range(n):
        v = base + 0.01 * rng.randn(dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_over_cap_drop_is_logged_not_silent(spark, caplog):
    import logging

    from odinson_spark.ops.similarity import lsh_ann_topk

    emb = _clustered_embeddings(spark)
    with caplog.at_level(logging.WARNING, logger="odinson_spark.ops.similarity"):
        out = lsh_ann_topk(emb, k=3, dim=8, n_planes=2, max_bucket_size=50)
        rows = out.collect()
    # the clustered corpus exceeds the cap in its (single) bucket → dropped →
    # empty result, but with a diagnostic naming the bucket and its size
    assert rows == []
    assert any("over-cap bucket" in r.message for r in caplog.records)


def test_lsh_derived_planes_return_results(spark):
    from odinson_spark.ops.similarity import derive_n_planes, lsh_ann_topk

    import numpy as np

    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # default (n_planes=None) derives the plane count from the corpus size;
    # with target_bucket_size=32 the 400 spread vectors split across >= 2^4
    # buckets, none over the cap, so results are non-empty
    out = lsh_ann_topk(
        emb, k=3, dim=8, max_bucket_size=64, target_bucket_size=32
    ).collect()
    assert len(out) > 0
    assert derive_n_planes(400, 32) == 4


def test_derive_n_planes_scaling():
    from odinson_spark.ops.similarity import derive_n_planes

    assert derive_n_planes(1_000, 1024) == 4  # clamped floor
    assert derive_n_planes(10**9, 1024) == 20
    assert derive_n_planes(10**12, 1024) == 30  # clamped ceiling: ~10^9 buckets
    # expected occupancy at the derived count stays near the target
    assert 10**12 / 2 ** derive_n_planes(10**12, 1024) <= 1024 * 2**10  # clamp tradeoff documented


def test_embedding_cosine_auto_overflow_guards_low_threshold(spark):
    import pytest as _pytest

    from odinson_spark.ops.dedup import embedding_cosine_pairs

    emb = _clustered_embeddings(spark, n=20)
    # low threshold + overflow: the auto default must refuse the LSH
    # substitute (recall collapse) instead of silently returning ~2% of pairs
    with _pytest.raises(ValueError, match="on_overflow='lsh'"):
        embedding_cosine_pairs(emb, threshold=0.35, max_broadcast_rows=5)
    # high threshold + overflow: auto routes to LSH
    routed = embedding_cosine_pairs(emb, threshold=0.9, max_broadcast_rows=5)
    assert routed.count() > 0


# ---------------------------------------------------------------------------
# IVF-Flat ANN (round-3: the brief's "IVF or LSH-bucketed variant" — LSH
# existed; this is the IVF half, same inlined-integer reproducibility design)
# ---------------------------------------------------------------------------


def _spread_embeddings(spark, n=200, dim=8, seed=5):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_full_probe_equals_exact(spark):
    """nprobe == nlist probes every cell → IVF degenerates to the exact
    brute-force result (the smooth recall dial's upper end)."""
    from odinson_spark.ops.similarity import cosine_topk, ivf_ann_topk

    emb = _spread_embeddings(spark)
    exact = {
        (r.query_id, r.rank): r.nbr_id
        for r in cosine_topk(emb, emb, k=3).collect()
    }
    ivf = {
        (r.query_id, r.rank): r.nbr_id
        for r in ivf_ann_topk(emb, k=3, dim=8, nlist=4, nprobe=4).collect()
    }
    assert ivf == exact


def test_ivf_partial_probe_recall(spark):
    """nprobe=2 of 4 cells: approximate but substantial recall, and every
    returned neighbor is a genuine vector (no duplicates per query/rank)."""
    from odinson_spark.ops.similarity import cosine_topk, ivf_ann_topk

    emb = _spread_embeddings(spark)
    exact = {
        (r.query_id, r.rank): r.nbr_id
        for r in cosine_topk(emb, emb, k=3).collect()
    }
    rows = ivf_ann_topk(emb, k=3, dim=8, nlist=4, nprobe=2).collect()
    got = {(r.query_id, r.rank): r.nbr_id for r in rows}
    assert len(got) == len(rows)  # (query, rank) unique → no double-scoring
    hits = sum(1 for key, nbr in exact.items() if got.get(key) == nbr)
    assert hits / len(exact) > 0.5


def test_ivf_over_cap_cell_logged_not_silent(spark, caplog):
    import logging

    from odinson_spark.ops.similarity import ivf_ann_topk

    emb = _clustered_embeddings(spark)  # one tight cone → one hot cell
    with caplog.at_level(logging.WARNING, logger="odinson_spark.ops.similarity"):
        out = ivf_ann_topk(emb, k=3, dim=8, nlist=4, nprobe=1, max_cell_size=50)
        rows = out.collect()
    assert rows == []
    assert any("over-cap" in r.message for r in caplog.records)


def test_ivf_derived_nlist_returns_results(spark):
    from odinson_spark.ops.similarity import derive_nlist, ivf_ann_topk

    emb = _spread_embeddings(spark)
    out = ivf_ann_topk(emb, k=3, dim=8, target_cell_size=50).collect()
    assert len(out) > 0
    assert derive_nlist(200, 50) == 4


def test_derive_nlist_scaling():
    from odinson_spark.ops.similarity import derive_nlist

    assert derive_nlist(100, 1024) == 2  # clamped floor
    assert derive_nlist(10**6, 1024, max_nlist=2048) == 977
    assert derive_nlist(10**6, 1024) == 256  # default plan-size clamp
    # past the clamp the documented move is hierarchical (LSH-prefix × cell)


def test_ivf_assignment_stays_jvm_side(spark):
    """Cell assignment + probe generation must be pure Catalyst — no Python
    worker stage anywhere in the IVF plan."""
    from odinson_spark.ops.similarity import ivf_ann_topk

    emb = _spread_embeddings(spark, n=20)
    plan = ivf_ann_topk(emb, k=3, dim=8, nlist=4, nprobe=2)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan


def test_ivf_lsh_prefix_hierarchical_shard(spark):
    """lsh_prefix_planes composes the key as bucket*nlist+cell. On a tight
    one-cone corpus every vector shares the LSH bucket, so the hierarchical
    result must EQUAL plain IVF (prefix is a constant offset); on a spread
    corpus every returned neighbor must share its query's bucket."""
    from odinson_spark.ops.similarity import (
        _bucket_column,
        _hyperplanes_int,
        ivf_ann_topk,
    )
    from pyspark.sql import functions as F

    cone = _clustered_embeddings(spark, n=80)
    plain = {
        (r.query_id, r.rank): (r.nbr_id, r.cosine)
        for r in ivf_ann_topk(cone, k=3, dim=8, nlist=4, nprobe=2).collect()
    }
    hier = {
        (r.query_id, r.rank): (r.nbr_id, r.cosine)
        for r in ivf_ann_topk(
            cone, k=3, dim=8, nlist=4, nprobe=2, lsh_prefix_planes=4
        ).collect()
    }
    assert hier == plain

    spread = _spread_embeddings(spark, n=150)
    planes = _hyperplanes_int(8, 4, seed=11 + 1)  # seed+1: the prefix planes
    buckets = {
        r.vec_id: r.b
        for r in spread.select(
            "vec_id", _bucket_column(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    rows = ivf_ann_topk(
        spread, k=3, dim=8, nlist=4, nprobe=4, lsh_prefix_planes=4
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert buckets[r.query_id] == buckets[r.nbr_id]


def test_ngram_jaccard_broadcast_equals_join(spark):
    """The broadcast-postings route (r6 optimization) must emit exactly the
    postings-join route's pairs — counts, fixed-point jaccard and all."""
    from odinson_spark.ops.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cols = ["doc_a", "doc_b", "n_common", "jaccard_e6"]
    bcast = sorted(
        tuple(r) for r in ngram_jaccard_pairs(docs, n=3, threshold=0.05).select(cols).collect()
    )
    join = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, n=3, threshold=0.05, max_broadcast_docs=0
        ).select(cols).collect()
    )
    assert bcast == join and len(bcast) > 0


def test_ngram_jaccard_broadcast_string_ids(spark):
    """String doc ids order by UTF-8 code points in both routes."""
    from odinson_spark.ops.dedup import ngram_jaccard_pairs

    rows = [
        ("b-doc", "one two three four five six"),
        ("a-doc", "one two three four five seven"),
        ("z-doc", "totally different words entirely here now"),
        ("short", "one two"),  # fewer than n tokens -> no grams
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    cols = ["doc_a", "doc_b", "n_common", "jaccard_e6"]
    bcast = sorted(tuple(r) for r in ngram_jaccard_pairs(docs, threshold=0.1).select(cols).collect())
    join = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(docs, threshold=0.1, max_broadcast_docs=0)
        .select(cols)
        .collect()
    )
    assert bcast == join
    assert all(a < b for a, b, *_ in bcast)


def test_ngram_jaccard_sort_unique_branch(spark, monkeypatch):
    """The large-corpus counting strategy (sort+run-length instead of
    bincount) must emit identical pairs."""
    from odinson_spark.ops import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cols = ["doc_a", "doc_b", "n_common", "jaccard_e6"]
    base = sorted(
        tuple(r) for r in dd.ngram_jaccard_pairs(docs, n=3, threshold=0.05).select(cols).collect()
    )
    monkeypatch.setattr(dd, "_BINCOUNT_MAX_DOCS", 0)
    alt = sorted(
        tuple(r) for r in dd.ngram_jaccard_pairs(docs, n=3, threshold=0.05).select(cols).collect()
    )
    assert base == alt and len(base) > 0
