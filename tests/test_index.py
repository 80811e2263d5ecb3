"""Materialized term-posting index (odinson_spark/index.py): the Spark
analogue of querying the reference's prebuilt Lucene index
(lucene/index/OdinsonIndexWriter.scala:113-205; postings-driven skipping in
lucene/search/*).

Invariants under test:
* index-path results are IDENTICAL to scan-path results for every pattern
  class (term, concat, or, negation, regex, fuzzy, traversal, event),
  including the unconstrained classes that must fall back to the full scan;
* the postings lookup is actually pruned: static partition filter on
  tbucket + pushed data filters on (field, term);
* candidate generation is sound: PFAnd/PFOr compose as intersection/union,
  unconstrained arms degrade to None (never an empty result).
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from odinson_spark.index import DEFAULT_INDEXED_COLUMNS, TermIndex
from odinson_spark.pipeline.extract import tokenize_documents
from odinson_spark.plans import prefilter as pf
from odinson_spark.search import SearchEngine


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    rows = []
    for i in range(40):
        extra = " fast" * (i % 3) + (" quick sort" if i % 5 == 0 else "")
        rows.append((i, f"alpha beta{extra} gamma fast key end", "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # through parquet so the scan path exercises real pushdown
    p = str(tmp_path_factory.mktemp("idxcorpus") / "docs.parquet")
    docs.write.parquet(p)
    return spark.read.parquet(p)


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "index")
    return TermIndex.build(tokenize_documents(corpus), out, n_term_buckets=8, n_doc_buckets=4)


@pytest.fixture(scope="module")
def scan_engine(corpus):
    return SearchEngine(tokenize_documents(corpus))


PATTERNS = [
    "fast",                      # single term — fully index-driven
    "quick sort",                # conjunction of terms (concat)
    "alpha | quick",             # union
    "key [!norm=key]",           # negation arm is unconstrained, term arm not
    "[norm=/qu.*/]",             # regex — term-dictionary rewrite
    "fast~",                     # fuzzy — term-dictionary rewrite
    "(?<c> [norm=fast]) >next []",  # traversal with edge prefilter
    "[] [norm=gamma]? fast",     # optional
    "alpha beta",                # adjacent phrase — positional pruning
    "alpha [] gamma",            # gapped phrase (fixed-width wildcard)
    "quick sort gamma",          # 3-anchor phrase
    "[norm=/be.*/] gamma",       # multi-term (regex) anchor inside a phrase
]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_index_path_equals_scan_path(index, scan_engine, pattern):
    a = sorted(
        map(tuple, index.engine().mentions(pattern).select("doc_id", "sent_id", "start", "end").collect())
    )
    b = sorted(
        map(tuple, scan_engine.mentions(pattern).select("doc_id", "sent_id", "start", "end").collect())
    )
    assert a == b and (len(a) > 0 or pattern == "quick sort")


def test_pagination_on_index_path(index, scan_engine):
    eng = index.engine()
    full = sorted(
        (r.doc_id, r.sent_id, r.start, r.end) for r in scan_engine.mentions("fast").collect()
    )
    seen, cursor = [], None
    while True:
        page = eng.search("fast", n=9, after=cursor)
        seen.extend((r.doc_id, r.sent_id, r.start, r.end) for r in page.rows)
        if page.next_cursor is None:
            break
        cursor = page.next_cursor
    assert seen == full


def test_postings_lookup_is_pruned(index):
    plan = index._term_keys(["norm"], "fast")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(tbucket" in plan or "tbucket" in plan.split("PartitionFilters")[1].split("]")[0]
    assert "term" in plan.split("PushedFilters")[1].split("]")[0]


def test_candidates_sound_and_unbounded_cases(index):
    # a term that exists
    keys = index.candidate_keys(pf.PFTerm("norm", "fast"))
    n_fast = keys.count()
    assert n_fast > 0
    # AND with unconstrained arm = just the constrained arm
    both = index.candidate_keys(pf.pf_and([pf.PFTerm("norm", "fast"), pf.PFTrue()]))
    assert both.count() == n_fast
    # OR with unconstrained arm cannot bound
    assert index.candidate_keys(pf.pf_or([pf.PFTerm("norm", "fast"), pf.PFTrue()])) is None
    # unknown field cannot bound
    assert index.candidate_keys(pf.PFTerm("nosuchfield", "x")) is None
    # PFFalse = empty
    assert index.candidate_keys(pf.PFFalse()).count() == 0
    # intersection really intersects: fast AND quick < fast
    inter = index.candidate_keys(
        pf.pf_and([pf.PFTerm("norm", "fast"), pf.PFTerm("norm", "quick")])
    )
    assert 0 < inter.count() < n_fast


def test_round_trip_read(spark, index):
    idx2 = TermIndex.read(spark, index.path)
    assert idx2.indexed_columns == index.indexed_columns
    a = index.candidate_keys(pf.PFTerm("norm", "fast")).count()
    assert idx2.candidate_keys(pf.PFTerm("norm", "fast")).count() == a


def test_meta_file_written(index):
    assert os.path.exists(os.path.join(index.path, "odinson_index_meta.json"))
    assert set(index.indexed_columns) <= set(DEFAULT_INDEXED_COLUMNS)


class TestIncremental:
    """add/delete/update/compact — the reference's live-index operations
    (lucene/index/IncrementalOdinsonIndex.scala:104-124): adds append into
    existing bucket directories, deletes tombstone, compact purges."""

    @pytest.fixture()
    def inc(self, spark, corpus, tmp_path):
        out = str(tmp_path / "inc_index")
        return TermIndex.build(
            tokenize_documents(corpus), out, n_term_buckets=8, n_doc_buckets=4
        )

    def _hits(self, idx, pattern="fast"):
        return sorted(
            (r.doc_id, r.sent_id, r.start, r.end)
            for r in idx.engine().mentions(pattern).collect()
        )

    def test_add_documents_visible_and_pruned(self, spark, inc):
        before = self._hits(inc)
        new = spark.createDataFrame(
            [(1000, "zeppelin fast zeppelin", "en")],
            "doc_id long, text string, lang string",
        )
        inc.add_documents(tokenize_documents(new))
        after = self._hits(inc)
        assert len(after) == len(before) + 1
        assert any(str(d) == "1000" for d, *_ in after)
        # the new term is index-reachable (not scan-fallback): candidate
        # lookup finds it through the postings
        from odinson_spark.plans import prefilter as pf

        keys = inc.candidate_keys(pf.PFTerm("norm", "zeppelin"))
        assert keys is not None and keys.count() == 1

    def test_delete_is_tombstone_until_compact(self, spark, inc):
        before = self._hits(inc)
        victims = sorted({d for d, *_ in before})[:2]
        inc.delete_documents(victims)
        after = self._hits(inc)
        assert {d for d, *_ in after}.isdisjoint(victims)
        assert len(after) < len(before)
        # physical files untouched before compact
        raw = inc.sentences.count()
        live = inc.live_sentences().count()
        assert raw - live == len(victims)
        inc.compact()
        assert inc.sentences.count() == live
        assert inc._tombstones() is None
        assert self._hits(inc) == after

    def test_compact_upgrades_positionless_index(self, spark, inc, tmp_path):
        """An index built before positional postings gains positions on
        compact() even with no tombstones pending (the documented upgrade
        path for the add_documents position-drop guard)."""
        import shutil

        tmp_pl = str(tmp_path / "pl")
        inc.postings.drop("positions").write.parquet(tmp_pl)
        shutil.rmtree(os.path.join(inc.path, "postings"))
        shutil.move(tmp_pl, os.path.join(inc.path, "postings"))
        # a real pre-positions index predates schema pinning too
        inc.meta.pop("schemas", None)
        inc._write_meta()
        inc.refresh()
        assert "positions" not in inc.postings.columns
        # appends into the legacy index stay position-less (uniform table)
        new = spark.createDataFrame(
            [(3000, "quokka fast quokka", "en")],
            "doc_id long, text string, lang string",
        )
        inc.add_documents(tokenize_documents(new))
        assert "positions" not in inc.postings.columns
        inc.compact()
        assert "positions" in inc.postings.columns
        # positional pruning live again: alpha/gamma never adjacent
        keys = inc.candidate_keys(
            pf.PFPhrase(((0, "norm", "alpha"), (1, "norm", "gamma")))
        )
        assert keys.count() == 0
        # and the appended doc survived the upgrade
        assert inc.candidate_keys(pf.PFTerm("norm", "quokka")).count() == 1

    def test_update_replaces(self, spark, inc):
        new = spark.createDataFrame(
            [(0, "replaced fast body", "en")],
            "doc_id long, text string, lang string",
        )
        inc.update_documents(tokenize_documents(new))
        hits = [t for t in self._hits(inc) if str(t[0]) == "0"]
        assert len(hits) == 1  # exactly the new version's single 'fast'
        # old tokens of doc 0 are gone
        assert all(str(t[0]) != "0" for t in self._hits(inc, "alpha"))


class TestMultiTermRewrite:
    """Regex/fuzzy leaves rewritten against the term dictionary — Lucene's
    MultiTermQuery rewrite (RegexpQuery/FuzzyQuery intersect an automaton
    with the terms enum; here an Arrow-batched Python predicate over the
    stats table, so index-path semantics are bit-identical to the matcher's
    own vocab predicate in match/context.py _vocab_pred)."""

    def test_regex_expansion_bounds_candidates(self, index):
        node = pf.PFMultiTerm("norm", "regex", "qu.*")
        keys = index.candidate_keys(node)
        assert keys is not None
        # 'quick' is the only qu.* vocab entry; docs with i%5==0 carry it
        assert keys.count() == 8
        assert index.estimated_candidates(node) == 8

    def test_fuzzy_expansion_bounds_candidates(self, index):
        # edit distance 1 from 'fast' — every doc contains 'fast'
        node = pf.PFMultiTerm("norm", "fuzzy", "fastt")
        keys = index.candidate_keys(node)
        assert keys is not None and keys.count() == 40

    def test_expansion_cap_falls_back_to_scan(self, index):
        node = pf.PFMultiTerm("norm", "regex", ".*")
        assert index.candidate_keys(node, max_expansions=2) is None
        assert index.estimated_candidates(node, max_expansions=2) is None

    def test_empty_expansion_is_empty_not_scan(self, index):
        node = pf.PFMultiTerm("norm", "regex", "zzznothing.*")
        keys = index.candidate_keys(node)
        assert keys is not None and keys.count() == 0

    def test_regex_query_takes_candidate_join_route(self, index, scan_engine):
        eng = index.engine(max_candidate_frac=0.5)
        df = eng.mentions("[norm=/qu.*/]")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan  # pruned by the expansion, not scanned
        a = sorted(map(tuple, df.select("doc_id", "sent_id", "start", "end").collect()))
        b = sorted(
            map(
                tuple,
                scan_engine.mentions("[norm=/qu.*/]")
                .select("doc_id", "sent_id", "start", "end")
                .collect(),
            )
        )
        assert a == b and len(a) > 0

    def test_mask_pf_emits_multi_term_nodes(self):
        from odinson_spark.lang.rules import RuleReader

        def tree_of(pattern):
            exts, _ = RuleReader().compile_rules(
                f"rules:\n  - name: q\n    type: basic\n    pattern: |\n      {pattern}\n"
            )
            return pf.prefilter_of(exts[0].program)

        t = tree_of("[norm=/qu.*/]")
        assert t == pf.PFMultiTerm("norm", "regex", "qu.*")
        t = tree_of("fast~")
        assert t == pf.PFMultiTerm("norm", "fuzzy", "fast")

    def test_literal_prefix(self):
        from odinson_spark.index import _literal_prefix

        assert _literal_prefix("qu.*") == "qu"
        assert _literal_prefix("quick") == "quick"
        assert _literal_prefix("q+x") == ""
        assert _literal_prefix(".*x") == ""
        assert _literal_prefix("ab?c") == "a"
        assert _literal_prefix("ab\\d") == "ab"
        assert _literal_prefix("ab{2}") == "a"
        # a top-level alternation voids the prefix ('cd' fullmatches
        # 'ab|cd' without starting with 'ab') — conservative everywhere
        assert _literal_prefix("ab|cd") == ""
        assert _literal_prefix("ab(c|d)") == ""
        # ...but a literal pipe (escaped / inside a class) keeps it
        assert _literal_prefix("ab\\|c") == "ab"
        assert _literal_prefix("ab[c|d]") == "ab"

    def test_regex_alternation_expansion_is_sound(self, index, scan_engine):
        # 'qu.*|sort' must match BOTH quick and sort through the index path
        pat = "[norm=/qu.*|sort/]"
        eng = index.engine(max_candidate_frac=1.0)
        a = sorted(
            map(tuple, eng.mentions(pat).select("doc_id", "sent_id", "start", "end").collect())
        )
        b = sorted(
            map(
                tuple,
                scan_engine.mentions(pat).select("doc_id", "sent_id", "start", "end").collect(),
            )
        )
        assert a == b and len(a) > 0
        node = pf.PFMultiTerm("norm", "regex", "qu.*|sort")
        # both quick (8 docs) and sort (8 docs) postings reachable
        assert index.estimated_candidates(node) == 16


class TestPhrasePruning:
    """Positional postings — Lucene SpanNearQuery(slop=0, inOrder) parity
    (the reference compiles concatenations to span-near queries,
    compiler/QueryCompiler.scala): the index intersects per-anchor position
    lists, pruning sentences that contain the terms but not adjacently."""

    def _tree(self, pattern):
        from odinson_spark.lang.rules import RuleReader

        exts, _ = RuleReader().compile_rules(
            f"rules:\n  - name: q\n    type: basic\n    pattern: |\n      {pattern}\n"
        )
        return pf.prefilter_of(exts[0].program)

    def _phrases(self, tree):
        nodes = [tree] + (list(tree.subs) if hasattr(tree, "subs") else [])
        return [n for n in nodes if isinstance(n, pf.PFPhrase)]

    def test_phrase_nodes_emitted(self):
        ph = self._phrases(self._tree("fast table"))
        assert ph == [pf.PFPhrase(((0, "norm", "fast"), (1, "norm", "table")))]
        ph = self._phrases(self._tree("fast [] table"))
        assert ph == [pf.PFPhrase(((0, "norm", "fast"), (2, "norm", "table")))]
        # variable-width gap splits the run; single-anchor sides emit nothing
        assert self._phrases(self._tree("fast []* table")) == []
        # exact quantifier keeps a fixed width
        ph = self._phrases(self._tree("fast []{2} table"))
        assert ph == [pf.PFPhrase(((0, "norm", "fast"), (3, "norm", "table")))]

    def test_phrase_candidates_tighter_than_and(self, index):
        both = index.candidate_keys(
            pf.pf_and([pf.PFTerm("norm", "alpha"), pf.PFTerm("norm", "gamma")])
        ).count()
        assert both == 40  # co-occur everywhere
        # never adjacent → positional intersection prunes to zero
        not_adj = index.candidate_keys(
            pf.PFPhrase(((0, "norm", "alpha"), (1, "norm", "gamma")))
        ).count()
        assert not_adj == 0
        # always adjacent → keeps everything
        adj = index.candidate_keys(
            pf.PFPhrase(((0, "norm", "alpha"), (1, "norm", "beta")))
        ).count()
        assert adj == 40
        # estimate = tightest anchor
        assert (
            index.estimated_candidates(
                pf.PFPhrase(((0, "norm", "alpha"), (1, "norm", "quick")))
            )
            == 8
        )

    def test_legacy_index_without_positions_degrades(self, index):
        node = pf.PFPhrase(((0, "norm", "alpha"), (1, "norm", "gamma")))
        legacy = index.postings.drop("positions")
        orig = index.postings
        try:
            index.postings = legacy
            keys = index.candidate_keys(node)
            # soundness floor: the AND-of-terms superset, no positional prune
            assert keys.count() == 40
        finally:
            index.postings = orig

    def test_multi_term_anchor_in_phrase(self, index):
        # "[norm=/be.*/] gamma": the regex token anchors POSITIONALLY
        # through the dictionary expansion (beta is the only be.* term);
        # beta and gamma are adjacent only in docs with no inserted extras
        # (i%3==0 and i%5!=0 → 11 of 40)
        node = pf.PFPhrase(
            anchors=((1, "norm", "gamma"),),
            multi_anchors=((0, pf.PFMultiTerm("norm", "regex", "be.*")),),
        )
        keys = index.candidate_keys(node)
        assert keys.count() == 11
        # co-occurrence alone would admit all 40 — the expansion anchor
        # prunes positionally, not just by key
        assert (
            index.candidate_keys(
                pf.pf_and([pf.PFMultiTerm("norm", "regex", "be.*"), pf.PFTerm("norm", "gamma")])
            ).count()
            == 40
        )
        # estimate includes the expansion df (beta in all 40 docs)
        assert index.estimated_candidates(node) == 40
        # a never-matching expansion inside a phrase proves emptiness
        empty = pf.PFPhrase(
            anchors=((1, "norm", "gamma"),),
            multi_anchors=((0, pf.PFMultiTerm("norm", "regex", "zzz.*")),),
        )
        assert index.candidate_keys(empty).count() == 0

    def test_multi_term_anchor_emitted(self):
        ph = self._phrases(self._tree("fast [norm=/qu.*/]"))
        assert ph == [
            pf.PFPhrase(
                anchors=((0, "norm", "fast"),),
                multi_anchors=((1, pf.PFMultiTerm("norm", "regex", "qu.*")),),
            )
        ]

    def test_null_positions_degrade_to_key_intersection(self, index):
        """Rows whose positions are unknown (a pre-positions file inside a
        mixed table) must KEEP their keys — the phrase filter degrades to
        key intersection per row instead of dropping true matches."""
        orig = index.postings
        patched = orig.withColumn(
            "positions",
            F.when(F.col("term") == "alpha", F.lit(None).cast("array<int>"))
            .otherwise(F.col("positions")),
        )
        try:
            index.postings = patched
            keys = index.candidate_keys(
                pf.PFPhrase(((0, "norm", "alpha"), (1, "norm", "gamma")))
            )
            # with known positions this is 0 (never adjacent); with alpha's
            # positions unknown it must fall back to co-occurrence (40)
            assert keys.count() == 40
        finally:
            index.postings = orig

    def test_phrase_query_takes_candidate_join_route(self, index, scan_engine):
        eng = index.engine(max_candidate_frac=1.0)
        df = eng.mentions("alpha [] gamma")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan
        a = sorted(map(tuple, df.select("doc_id", "sent_id", "start", "end").collect()))
        b = sorted(
            map(
                tuple,
                scan_engine.mentions("alpha [] gamma")
                .select("doc_id", "sent_id", "start", "end")
                .collect(),
            )
        )
        assert a == b and len(a) > 0


def test_streaming_ingest_into_index(spark, corpus, tmp_path):
    """Structured-Streaming ingest into the live index: each micro-batch
    lands via add_documents (foreachBatch), the Spark rendering of the
    reference's continuous indexing loop (IncrementalOdinsonIndex.scala:104
    indexOdinsonDoc called per incoming doc + refresh). After availableNow
    drains, streamed docs are index-reachable through the postings."""
    idx = TermIndex.build(
        tokenize_documents(corpus),
        str(tmp_path / "stream_index"),
        n_term_buckets=8,
        n_doc_buckets=4,
    )
    src = str(tmp_path / "incoming")
    new = spark.createDataFrame(
        [(2000 + i, "xylophone fast xylophone", "en") for i in range(3)],
        "doc_id long, text string, lang string",
    )
    new.write.parquet(src)
    stream = spark.readStream.schema(new.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _id: idx.add_documents(tokenize_documents(batch))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    keys = idx.candidate_keys(pf.PFTerm("norm", "xylophone"))
    assert keys is not None and keys.count() == 3
    hits = idx.engine().mentions("xylophone").collect()
    assert sorted({str(r.doc_id) for r in hits}) == ["2000", "2001", "2002"]


def test_explain_reports_route_and_reason(index):
    eng = index.engine(max_candidate_frac=0.5)
    # selective term → index route with a df estimate
    info = eng.explain("quick")
    assert info["route"] == "index" and info["estimated_candidates"] == 8
    # stop-word-class term → cost-model scan
    info = eng.explain("alpha")
    assert info["route"] == "scan" and "cost model" in info["reason"]
    # pure wildcard → unbounded prefilter scan
    info = eng.explain("[]")
    assert info["route"] == "scan" and "unbounded" in info["reason"]
    assert info["estimated_candidates"] is None


def test_explain_names_missing_dictionary(spark, corpus, tmp_path):
    """On an index without a stats table a multi-term pattern routes to
    scan, and explain() must name the REAL cause (dictionary absent), not
    the generic unbounded-prefilter reason."""
    import shutil

    out = str(tmp_path / "nostats_index")
    idx = TermIndex.build(
        tokenize_documents(corpus), out, n_term_buckets=8, n_doc_buckets=4
    )
    shutil.rmtree(os.path.join(out, "stats"))
    idx.refresh()
    assert idx.stats is None
    info = idx.engine().explain("[norm=/qu.*/]")
    assert info["route"] == "scan" and "dictionary absent" in info["reason"]


def test_shell_explain_command(spark, index):
    import io

    from odinson_spark.shell import OdinsonShell

    out = io.StringIO()
    sh = OdinsonShell(index.engine(max_candidate_frac=0.5), out=out)
    sh.handle(":explain quick")
    text = out.getvalue()
    assert "route = index" in text and "estimated_candidates = 8" in text


def test_random_patterns_index_equals_scan(spark, index, scan_engine):
    """Property check over the whole index planner: 40 seeded random
    patterns (terms, wildcards, exact quantifiers, optionals, regex, fuzzy)
    compiled into ONE grammar and extracted in a single pass on both
    engines — every candidate route (term lookup, multi-term rewrite,
    positional phrase, cost-model fallback, scan degrade on unconstrained
    arms) must agree with the scan path rule-for-rule."""
    import random

    import yaml

    from odinson_spark.lang.rules import RuleReader
    from odinson_spark.pipeline.extract import extract_mentions_df

    rng = random.Random(4242)
    vocab = ["alpha", "beta", "gamma", "fast", "key", "end", "quick", "sort", "zzz"]

    def element():
        r = rng.random()
        if r < 0.55:
            return rng.choice(vocab)
        if r < 0.70:
            return "[]"
        if r < 0.78:
            return "[]{2}"
        if r < 0.86:
            return f"[norm=/{rng.choice(['qu', 'fa', 'ga', 'zz'])}.*/]"
        if r < 0.93:
            return rng.choice(vocab) + "?"
        return rng.choice(vocab) + "~"

    rules = [
        {
            "name": f"r{i}",
            "type": "basic",
            "pattern": " ".join(element() for _ in range(rng.randint(2, 4))),
        }
        for i in range(40)
    ]
    exts, _ = RuleReader().compile_rules(yaml.safe_dump({"rules": rules}))

    def run(eng):
        m = extract_mentions_df(eng._prefilter_sentences(eng.sentences, exts), exts)
        return sorted(
            map(
                tuple,
                m.select("found_by", "doc_id", "sent_id", "start", "end").collect(),
            )
        )

    a = run(index.engine(max_candidate_frac=1.0))
    b = run(scan_engine)
    assert a == b and len(a) > 0


def test_random_lifecycle_matches_generation_model(spark, tmp_path):
    """Property check of the incremental lifecycle: a seeded random
    sequence of add / delete / update / compact ops, mirrored against an
    independent Python model of Lucene's sequence-number semantics
    (IncrementalOdinsonIndex.scala:104-124 — a delete hides only versions
    written BEFORE it; re-adds stay visible; compact is semantics-
    preserving). After every op the visible doc multiset must match."""
    import random

    rng = random.Random(99)
    base = spark.createDataFrame(
        [(i, "seed fast doc", "en") for i in range(4)],
        "doc_id long, text string, lang string",
    )
    idx = TermIndex.build(
        tokenize_documents(base), str(tmp_path / "life_idx"), n_term_buckets=4, n_doc_buckets=2
    )
    # model: list of live (doc_id, gen); every doc body contains one 'fast'
    gen = 1
    live = [(i, 0) for i in range(4)]
    next_id = 100

    def visible():
        return sorted(d for d, _ in live)

    def spark_visible():
        return sorted(
            int(r.doc_id) for r in idx.engine().mentions("fast").collect()
        )

    for step in range(12):
        op = rng.choice(["add", "delete", "update", "compact"])
        if op == "add":
            ids = [next_id + k for k in range(rng.randint(1, 2))]
            next_id += len(ids)
            df = spark.createDataFrame(
                [(i, "added fast body", "en") for i in ids],
                "doc_id long, text string, lang string",
            )
            idx.add_documents(tokenize_documents(df))
            live.extend((i, gen) for i in ids)
            gen += 1
        elif op == "delete":
            if not live:
                continue
            victims = rng.sample([d for d, _ in live], k=min(2, len(live)))
            idx.delete_documents(victims)
            # tombstone cutoff = gen: hides versions with g < gen (all live)
            live = [(d, g) for d, g in live if d not in victims]
            gen += 1
        elif op == "update":
            if not live:
                continue
            victim = rng.choice([d for d, _ in live])
            df = spark.createDataFrame(
                [(victim, "updated fast body", "en")],
                "doc_id long, text string, lang string",
            )
            idx.update_documents(tokenize_documents(df))
            live = [(d, g) for d, g in live if d != victim]
            gen += 1  # the delete inside update
            live.append((victim, gen))
            gen += 1  # the add inside update
        else:
            idx.compact()  # semantics-preserving
        assert spark_visible() == visible(), (step, op)
        # index engine ≡ scan engine on the SAME live corpus after every
        # step — catches tombstone/positions edges the generation model
        # abstracts away (term lookup + a positional phrase so the
        # position-list path is exercised against stale/mixed postings)
        scan_eng = SearchEngine(idx.live_sentences())
        idx_eng = idx.engine(max_candidate_frac=1.0)
        for pat in ("fast", "added fast"):
            a = sorted(
                map(
                    tuple,
                    idx_eng.mentions(pat)
                    .select("doc_id", "sent_id", "start", "end")
                    .collect(),
                )
            )
            b = sorted(
                map(
                    tuple,
                    scan_eng.mentions(pat)
                    .select("doc_id", "sent_id", "start", "end")
                    .collect(),
                )
            )
            assert a == b, (step, op, pat)


def test_cost_model_routes_by_selectivity(spark, index):
    """Lucene-style docFreq planning: a stop-word-class term (appears in
    every doc — candidates >> max_candidate_frac) must skip the candidate
    join and use the prefiltered scan; a selective term must use it."""
    eng = index.engine(max_candidate_frac=0.1)
    # 'alpha' is in all 40 docs -> est = corpus -> scan route (no semi join)
    plan_common = (
        eng.mentions("alpha")._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" not in plan_common
    # 'quick' is in 8/40 docs (20%) -> under a generous frac -> join route
    eng_loose = index.engine(max_candidate_frac=0.5)
    plan_rare = (
        eng_loose.mentions("quick")._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan_rare
    # df estimates themselves
    assert index.estimated_candidates(pf.PFTerm("norm", "alpha")) == 40
    assert index.estimated_candidates(pf.PFTerm("norm", "quick")) == 8
    assert index.estimated_candidates(
        pf.pf_and([pf.PFTerm("norm", "alpha"), pf.PFTerm("norm", "quick")])
    ) == 8
    assert index.estimated_candidates(
        pf.pf_or([pf.PFTerm("norm", "alpha"), pf.PFTerm("norm", "quick")])
    ) == 48
    assert index.estimated_candidates(pf.PFTrue()) is None


def test_postings_sql_route_equals_python_route(spark):
    """The JVM postings builder (r6) must emit exactly the mapInPandas
    route's rows — fields, terms, buckets and position lists."""
    from odinson_spark.index import _bucket, _postings_of, _postings_of_sql
    from odinson_spark.pipeline.extract import tokenize_documents
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wb = tokenize_documents(docs).withColumn(
        "doc_bucket", _bucket(F.col("doc_id"), 4)
    ).withColumn("gen", F.lit(0).cast("long"))
    cols = [c for c in
            ("raw", "word", "norm", "norm_alt", "lemma", "tag", "chunk",
             "entity", "incoming_flat", "outgoing_flat")
            if c in wb.columns]
    py = _postings_of(wb, cols, 8)
    sql = _postings_of_sql(wb, cols, 8)
    assert py.schema == sql.schema
    key = ["field", "term", "doc_bucket", "doc_id", "sent_id", "tbucket"]
    a = sorted(
        (tuple(r[k] for k in key), tuple(r["positions"]) if r["positions"] is not None else None)
        for r in py.collect()
    )
    b = sorted(
        (tuple(r[k] for k in key), tuple(r["positions"]) if r["positions"] is not None else None)
        for r in sql.collect()
    )
    assert a == b and len(a) > 0


def test_idx_graph_edge_anchor_in_plan(index, scan_engine):
    """An edge-anchored pattern through the index must (a) equal the scan
    path and (b) actually use the outgoing_flat postings lookup when the
    candidate join is forced."""
    eng = index.engine(max_candidate_frac=1.0)
    pat = "quick >next []"
    a = sorted(
        map(tuple, eng.mentions(pat).select("doc_id", "sent_id", "start", "end").collect())
    )
    b = sorted(
        map(
            tuple,
            scan_engine.mentions(pat)
            .select("doc_id", "sent_id", "start", "end")
            .collect(),
        )
    )
    assert a == b and len(a) > 0
    plan = eng.mentions(pat)._jdf.queryExecution().executedPlan().toString()
    assert "outgoing_flat" in plan and "LeftSemi" in plan
