"""Argument-quantifier parity (ported from the reference's
core/src/test/scala/ai/lum/odinson/events/TestArgQuantifiers.scala):
`arg`, `arg?`, `arg+`, `arg*` control how many matches of one argument are
packaged into each EventMatch. Fixture: gummy-bears-consumption."""

import pytest

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import filter_trigger_overlaps, find_matches
from odinson_spark.match.matches import EventMatch
from odinson_spark.testing import batch_from_doc_json

TRAVERSAL = ">nmod_of >conj? [entity=B-dessert][entity=I-dessert]*"


def run(example_docs, quant):
    pattern = (
        f"trigger = consumption\ntheme: ^dessert{quant} = {TRAVERSAL}\n"
    )
    compiler = PatternCompiler()
    program = compiler.compile(pattern)
    batch = batch_from_doc_json(example_docs["gummy-bears-consumption"])
    out = []
    for i in range(batch.n_sentences):
        out.extend(filter_trigger_overlaps(find_matches(program, batch.context(i))))
    return [m for m in out if isinstance(m, EventMatch)]


def themes(m):
    return sorted((c.match.start, c.match.end) for c in m.captures if c.name == "theme")


def test_required_single_theme(example_docs):
    ms = run(example_docs, "")
    assert len(ms) == 2
    assert all((m.trigger.start, m.trigger.end) == (1, 2) for m in ms)
    assert sorted(themes(m)[0] for m in ms) == [(3, 5), (6, 7)]


def test_optional_single_theme(example_docs):
    ms = run(example_docs, "?")
    assert len(ms) == 2
    assert sorted(themes(m)[0] for m in ms) == [(3, 5), (6, 7)]


def test_required_plus_collects_all_themes(example_docs):
    ms = run(example_docs, "+")
    assert len(ms) == 1
    assert themes(ms[0]) == [(3, 5), (6, 7)]


def test_optional_star_collects_all_themes(example_docs):
    ms = run(example_docs, "*")
    assert len(ms) == 1
    assert themes(ms[0]) == [(3, 5), (6, 7)]
