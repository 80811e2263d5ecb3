"""Event-query parity suite (expectations ported from the reference's
core/src/test/scala/ai/lum/odinson/events/TestEvents.scala:14-120)."""

import pytest

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import filter_trigger_overlaps, find_matches
from odinson_spark.match.matches import EventMatch
from odinson_spark.testing import batch_from_doc_json


def run_event(example_docs, doc_key, pattern):
    compiler = PatternCompiler()
    program = compiler.compile(pattern)
    batch = batch_from_doc_json(example_docs[doc_key])
    out = []
    for i in range(batch.n_sentences):
        ctx = batch.context(i)
        out.extend(filter_trigger_overlaps(find_matches(program, ctx)))
    return out


def args_of(m: EventMatch):
    return sorted((c.name, c.match.start, c.match.end) for c in m.captures)


def test_event_promoted_entities(example_docs):
    pattern = """
    trigger = [lemma=eat]
    subject: ^NP = >nsubj [chunk=B-NP][chunk=I-NP]*
    object: ^NP = >dobj [chunk=B-NP][chunk=I-NP]*
    """
    ms = run_event(example_docs, "becky-gummy-bears", pattern)
    assert len(ms) == 1
    m = ms[0]
    assert (m.trigger.start, m.trigger.end) == (1, 2)
    assert args_of(m) == [("object", 2, 4), ("subject", 0, 1)]


def test_event_arg_quantifier_greedy(example_docs):
    pattern = """
    trigger = [lemma=eat]
    subject: ^NP = >nsubj [chunk=B-NP][chunk=I-NP]*
    object: ^NP = >dobj gummy? bears
    """
    ms = run_event(example_docs, "becky-gummy-bears", pattern)
    assert len(ms) == 1
    m = ms[0]
    assert (m.trigger.start, m.trigger.end) == (1, 2)
    assert args_of(m) == [("object", 2, 4), ("subject", 0, 1)]


def test_event_promote_token_without_surface(example_docs):
    pattern = """
    trigger = [lemma=eat]
    subject: ^NP = >nsubj
    object: ^NP = >dobj
    """
    ms = run_event(example_docs, "becky-gummy-bears", pattern)
    assert len(ms) == 1
    m = ms[0]
    assert (m.trigger.start, m.trigger.end) == (1, 2)
    assert args_of(m) == [("object", 3, 4), ("subject", 0, 1)]


def test_event_untyped_args(example_docs):
    pattern = """
    trigger = [lemma=eat]
    subject = >nsubj [chunk=B-NP][chunk=I-NP]*
    object = >dobj [chunk=B-NP][chunk=I-NP]*
    """
    ms = run_event(example_docs, "becky-gummy-bears", pattern)
    assert len(ms) == 1
    m = ms[0]
    assert (m.trigger.start, m.trigger.end) == (1, 2)
    assert args_of(m) == [("object", 2, 4), ("subject", 0, 1)]


def test_argument_metadata_unique_names(example_docs):
    pattern = """
    trigger = [lemma=eat]
    subject: ^NP = >nsubj [chunk=B-NP][chunk=I-NP]*
    object: ^NP = >dobj gummy? bears
    """
    ms = run_event(example_docs, "becky-gummy-bears", pattern)
    names = [a.name for a in ms[0].arg_metadata]
    assert len(names) == len(set(names))
