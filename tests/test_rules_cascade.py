"""Grammar cascade: YAML rules, vars, priorities, state (@Label), promotion.

Behavioral model: RuleReader.scala + ExtractorEngine.scala:441-479.
Sentence (becky-gummy-bears): "Becky ate gummy bears ." with nsubj/dobj edges.
"""

import textwrap

from odinson_spark.lang.rules import Priority, RuleReader, substitute_vars
from odinson_spark.match.extractor import BatchExtractor
from odinson_spark.testing import batch_from_doc_json


def test_priority_specs():
    assert Priority("2").matches(2) and not Priority("2").matches(3)
    assert Priority("2-5").matches(4) and not Priority("2-5").matches(6)
    assert Priority("3+").matches(7) and not Priority("3+").matches(2)
    assert Priority("[2,5]").matches(5) and not Priority("[2,5]").matches(3)


def test_var_substitution():
    assert substitute_vars("a ${x} c", {"x": "b"}) == "a b c"
    assert substitute_vars("${a}", {"a": "${b}", "b": "z"}) == "z"


def test_list_vars_or_joined():
    reader = RuleReader()
    rules, _ = reader.rules_from_string(
        textwrap.dedent(
            """
            vars:
              verbs:
                - eat
                - devour
            rules:
              - name: r1
                type: basic
                pattern: "[lemma=/${verbs}/]"
            """
        )
    )
    assert rules[0].pattern == "[lemma=/eat|devour/]"


GRAMMAR = """
vars:
  np: "[chunk=B-NP][chunk=I-NP]*"
rules:
  - name: find-np
    label: NP
    type: basic
    priority: 1
    pattern: |
      (?<np> ${np})
  - name: eating-event
    label: Eating
    type: event
    priority: 2
    pattern: |
      trigger = [lemma=eat]
      subject: NP = >nsubj
      object: NP = >dobj
"""


def test_cascade_with_state(example_docs):
    reader = RuleReader()
    extractors, _ = reader.compile_rules(GRAMMAR)
    batch = batch_from_doc_json(example_docs["becky-gummy-bears"])
    ex = BatchExtractor(extractors)
    mentions = ex.extract_mentions(batch, ["becky"], [0])
    by_rule = {}
    for m in mentions:
        by_rule.setdefault(m.found_by, []).append(m)
    # priority 1 found the NPs: "Becky" and "gummy bears"
    np_spans = sorted((m.start, m.end) for m in by_rule["find-np"])
    assert np_spans == [(0, 1), (2, 4)]
    # priority 2 found the event whose typed args are state mentions
    events = by_rule["eating-event"]
    assert len(events) == 1
    ev = events[0]
    assert (ev.start, ev.end) == (1, 2)
    subj = ev.arguments["subject"][0]
    obj = ev.arguments["object"][0]
    assert (subj.start, subj.end) == (0, 1)
    assert (obj.start, obj.end) == (2, 4)


def test_no_state_single_pass(example_docs):
    reader = RuleReader()
    extractors, _ = reader.compile_rules(GRAMMAR)
    batch = batch_from_doc_json(example_docs["becky-gummy-bears"])
    ex = BatchExtractor(extractors)
    mentions = ex.extract_no_state(batch, ["becky"], [0])
    # without state, the typed-arg event can't resolve @NP mentions → only NPs
    rules = {m.found_by for m in mentions}
    assert "find-np" in rules
    assert "eating-event" not in rules
