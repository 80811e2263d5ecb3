"""Docs-as-tests parity: every example from the reference's query
documentation is executable (ported from
core/src/test/scala/ai/lum/odinson/documentation/TestDocumentationGraphtraversals.scala)."""

import pytest

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import filter_trigger_overlaps, find_matches
from odinson_spark.match.matches import EventMatch
from odinson_spark.testing import batch_from_doc_json


def run_event(example_docs, doc, pattern):
    program = PatternCompiler().compile(pattern)
    batch = batch_from_doc_json(example_docs[doc])
    out = []
    for i in range(batch.n_sentences):
        out.extend(filter_trigger_overlaps(find_matches(program, batch.context(i))))
    return [m for m in out if isinstance(m, EventMatch)]


def run_basic(example_docs, doc, pattern):
    program = PatternCompiler().compile(pattern)
    batch = batch_from_doc_json(example_docs[doc])
    out = []
    for i in range(batch.n_sentences):
        out.extend(find_matches(program, batch.context(i)))
    return out


def one_arg(m, name):
    caps = [(c.match.start, c.match.end) for c in m.captures if c.name == name]
    assert len(caps) == 1
    return caps[0]


def test_outgoing_label(example_docs):
    ms = run_event(example_docs, "becky-gummy-bears", "trigger = [lemma=eat]\nobject: ^NP = >dobj")
    assert len(ms) == 1
    assert (ms[0].trigger.start, ms[0].trigger.end) == (1, 2)
    assert one_arg(ms[0], "object") == (3, 4)


def test_incoming_label_regex(example_docs):
    ms = run_event(
        example_docs, "becky-gummy-bears", "trigger = [lemma=gummy]\nobject: ^NP = </amod|xcomp/"
    )
    assert len(ms) == 1
    assert (ms[0].trigger.start, ms[0].trigger.end) == (2, 3)
    assert one_arg(ms[0], "object") == (3, 4)


def test_incoming_wildcard(example_docs):
    ms = run_event(example_docs, "becky-gummy-bears", "trigger = [lemma=gummy]\nobject: ^NP = <<")
    assert len(ms) == 1
    assert one_arg(ms[0], "object") == (3, 4)


def test_outgoing_wildcard(example_docs):
    ms = run_event(example_docs, "becky-gummy-bears", "trigger = [lemma=bear]\nobject: ^NP = >>")
    assert len(ms) == 1
    assert (ms[0].trigger.start, ms[0].trigger.end) == (3, 4)
    assert one_arg(ms[0], "object") == (2, 3)


def test_wildcard_ranged_traversal(example_docs):
    ms = run_event(
        example_docs, "becky-gummy-bears", "trigger = [lemma=eat]\nobject: ^NP = >>{2,3}"
    )
    assert len(ms) == 1
    assert one_arg(ms[0], "object") == (2, 3)
    ms = run_event(
        example_docs, "becky-gummy-bears", "trigger = [lemma=bear]\nobject: ^NP = >>{2,3}"
    )
    assert ms == []


def spans(ms):
    return sorted((m.start, m.end) for m in ms)


def test_julio_optional_traversal(example_docs):
    ms = run_basic(example_docs, "me_and_julio", "She saw >dobj [] (>conj_and [])?")
    assert spans(ms) == [(2, 3), (4, 5)]


def test_julio_ranged_traversal(example_docs):
    ms = run_basic(example_docs, "me_and_julio", "She saw >dobj [] (>conj_and []){,2}")
    assert spans(ms) == [(2, 3), (4, 5)]


def test_julio_optional_expansion(example_docs):
    ms = run_basic(example_docs, "me_and_julio", "She saw >dobj (?^ [] >conj_and [])?")
    assert spans(ms) == [(2, 5)]


def test_julio_ranged_expansion(example_docs):
    ms = run_basic(example_docs, "me_and_julio", "She saw >dobj (?^ [] >conj_and []){,2}")
    assert spans(ms) == [(2, 5)]
