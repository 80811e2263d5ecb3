"""Engine options: fuzzy terms, disableMatchSelector, trigger overlaps."""

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import filter_trigger_overlaps, find_matches
from odinson_spark.testing import match_strings, sentence_batch_from_texts


def run(pattern, text, **kw):
    compiler = PatternCompiler()
    program = compiler.compile(pattern)
    batch = sentence_batch_from_texts([text])
    ms = find_matches(program, batch.context(0), **kw)
    return match_strings(text.split(), ms)


def test_fuzzy_term():
    # Lucene FuzzyQuery semantics: edit distance <= 2
    assert run("dog~", "dog dogs doggy dragon cat") == ["dog", "dogs", "doggy"]


def test_fuzzy_field_constraint():
    # colour (1 edit) and colored (2 edits) are both within maxEdits=2
    assert run('[norm="color"~]', "color colour colored colorful") == [
        "color",
        "colour",
        "colored",
    ]


def test_disable_match_selector_returns_all_candidates():
    # with the selector, greedy b* consumes everything: one match
    assert run("a b* c", "a b b c") == ["a b b c"]
    # without it, every candidate derivation is returned
    got = run("a b* c", "a b b c", disable_match_selector=True)
    assert got == ["a b b c"]  # only one candidate exists for this input
    got2 = run("a []*? c", "a c c", disable_match_selector=True)
    assert "a c" in got2 and "a c c" in got2  # both lazy candidates emitted


def test_trigger_overlap_filter():
    compiler = PatternCompiler()
    program = compiler.compile(
        "trigger = b\narg = >next []\n".replace("arg = >next []", "arg = >next []")
    )
    # build a sentence with a next-chain graph
    from odinson_spark.testing import sentence_batch_from_docs

    toks = ["a", "b", "c"]
    batch = sentence_batch_from_docs(
        [{"raw": toks, "edges": [(0, 1, "next"), (1, 2, "next")]}]
    )
    ms = find_matches(program, batch.context(0))
    kept = filter_trigger_overlaps(ms)
    # trigger [1,2) arg -> token 2 [2,3): no overlap, survives
    assert len(kept) == 1
    # now an argument that lands on the trigger itself must be dropped
    program2 = compiler.compile("trigger = b\narg = <next []")
    # <next from b reaches token 0 ('a'): no overlap either; use a self loop
    batch2 = sentence_batch_from_docs(
        [{"raw": toks, "edges": [(1, 1, "self"), (1, 2, "next")]}]
    )
    program3 = compiler.compile("trigger = b\narg = >self []")
    ms3 = find_matches(program3, batch2.context(0))
    assert len(filter_trigger_overlaps(ms3)) == 0  # arg == trigger span → dies
