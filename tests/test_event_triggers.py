"""Event-trigger parity suite (expectations ported from the reference's
core/src/test/scala/ai/lum/odinson/events/TestEventTriggers.scala) — basic
vs event form of the same extraction, quantified triggers, arguments via
captures. Runs on the hedgehogs-coypy fixture document."""

import pytest

from odinson_spark.lang.rules import RuleReader
from odinson_spark.match.extractor import BatchExtractor
from odinson_spark.testing import batch_from_doc_json

RESULT_VAR = "([tag=/J.*/]{,3} [tag=/N.*/]+ (of [tag=DT]? [tag=/J.*/]{,3} [tag=/N.*/]+)?)"

EXPECTED = ["hedgehogs", "coypu", "wild cloven-footed animals", "deer", "zoo animals"]


def run_grammar(example_docs, grammar, doc="hedgehogs-coypy"):
    extractors, _ = RuleReader().compile_rules(grammar)
    batch = batch_from_doc_json(example_docs[doc])
    ex = BatchExtractor(extractors)
    mentions = ex.extract_mentions(batch, ["d"] * batch.n_sentences, list(range(batch.n_sentences)))
    toks = batch.raw_layers["raw"]
    return mentions, toks


def arg_texts(mentions, toks, name, label=None):
    out = []
    for m in mentions:
        if label and m.label != label:
            continue
        for a in m.arguments.get(name, []):
            out.append(" ".join(toks[a.sent_id][a.start : a.end]))
    return out


def test_basic_pattern_trigger_capture(example_docs):
    grammar = f"""
vars:
  result: "{RESULT_VAR}"
rules:
  - name: example-rule
    type: basic
    label: MainEvent
    pattern: |
      animals >nmod_such_as >/conj.*/? (?<result> ${{result}})
"""
    mentions, toks = run_grammar(example_docs, grammar)
    got = arg_texts(mentions, toks, "result", label="MainEvent")
    assert got == EXPECTED


def test_event_pattern_trigger(example_docs):
    grammar = f"""
vars:
  result: "{RESULT_VAR}"
rules:
  - name: example-rule
    type: event
    label: MainEvent
    pattern: |
      trigger = animals
      result = >nmod_such_as >/conj.*/? ${{result}}
"""
    mentions, toks = run_grammar(example_docs, grammar)
    got = arg_texts(mentions, toks, "result", label="MainEvent")
    assert got == EXPECTED


def test_event_pattern_quantified_trigger(example_docs):
    grammar = f"""
vars:
  result: "{RESULT_VAR}"
rules:
  - name: example-rule
    type: event
    label: MainEvent
    pattern: |
      trigger = wild? animals
      result = >nmod_such_as >/conj.*/? ${{result}}
"""
    mentions, toks = run_grammar(example_docs, grammar)
    got = arg_texts(mentions, toks, "result", label="MainEvent")
    assert got == EXPECTED
