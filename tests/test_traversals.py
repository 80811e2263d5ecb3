"""Graph-traversal parity suite (expectations ported from the reference's
core/src/test/scala/ai/lum/odinson/traversals/TestTraversals.scala:17-114)."""

import pytest

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import find_matches
from odinson_spark.testing import batch_from_doc_json, match_strings


def run(example_docs, doc_key, pattern):
    compiler = PatternCompiler()
    program = compiler.compile(pattern)
    batch = batch_from_doc_json(example_docs[doc_key])
    out = []
    for i in range(batch.n_sentences):
        ctx = batch.context(i)
        ms = find_matches(program, ctx)
        toks = batch.raw_layers["raw"][i]
        out.extend(match_strings(toks, ms))
    return out


def test_conj_and(example_docs):
    got = run(example_docs, "alien-species", "[word=cats] >conj_and [tag=/N.*/]")
    assert got == ["horses", "cattle"]


def test_parenthesized_traversal(example_docs):
    got = run(example_docs, "alien-species", "[word=cats] (>conj_and [tag=/N.*/])")
    assert got == ["horses", "cattle"]


HEDGEHOG_CASES = [
    ("?", ["animals", "hedgehogs", "coypu", "yyymals"]),
    ("{1}", ["hedgehogs", "coypu", "yyymals"]),
    ("{2}", ["deer", "zzzmals"]),
    ("{1,2}", ["hedgehogs", "coypu", "yyymals", "deer", "zzzmals"]),
    ("+", ["hedgehogs", "coypu", "yyymals", "deer", "zzzmals"]),
    ("*", ["animals", "hedgehogs", "coypu", "yyymals", "deer", "zzzmals"]),
]


@pytest.mark.parametrize("quant,expected", HEDGEHOG_CASES, ids=[c[0] for c in HEDGEHOG_CASES])
def test_traversal_group_quantifiers(example_docs, quant, expected):
    pattern = f"[word=animals] (>nmod_such_as []){quant}"
    got = run(example_docs, "hedgehogs-coypy-2", pattern)
    assert got == expected


EXPAND_CASES = [
    ("John <nsubj >nmod_with []", ["chopsticks"]),
    ("John <nsubj >nmod_with (?^ [])", ["chopsticks"]),
    ("John <nsubj >nmod_with (?^ [] >conj [])", ["chopsticks and a spoon"]),
    ("John <nsubj >nmod_with (?^ [] (>conj [])?)", ["chopsticks", "chopsticks and a spoon"]),
]


@pytest.mark.parametrize("pattern,expected", EXPAND_CASES, ids=[c[0] for c in EXPAND_CASES])
def test_expansion(example_docs, pattern, expected):
    got = run(example_docs, "chopsticks-spoon", pattern)
    assert got == expected
