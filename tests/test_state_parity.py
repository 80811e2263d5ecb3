"""Parity: state/TestState.scala — @Label state queries in basic/event
patterns, argument promotion, StateMatch conversion, and the no-state path.
Sentence (becky-gummy-bears-v2): "Becky ate gummy bears ." with nsubj/dobj.
"""

from odinson_spark.lang.rules import RuleReader
from odinson_spark.match.extractor import BatchExtractor
from odinson_spark.match.matches import StateMatch
from odinson_spark.testing import batch_from_doc_json


def run(example_docs, grammar, use_state):
    extractors, _ = RuleReader().compile_rules(grammar)
    batch = batch_from_doc_json(example_docs["becky-gummy-bears-v2"])
    runner = BatchExtractor(extractors)
    ids = ["d"] * batch.n_sentences
    sids = list(range(batch.n_sentences))
    if use_state:
        return runner.extract_mentions(batch, ids, sids)
    return runner.extract_no_state(batch, ids, sids)


def with_label(mentions, label):
    return [m for m in mentions if m.label == label]


FOUR_RULES = """
rules:
  - name: first
    label: First
    type: basic
    priority: 1
    pattern: |
      ate

  - name: second
    label: Second
    type: event
    priority: 2
    pattern: |
      trigger = @First
      theme = >dobj []

  - name: third
    label: Third
    type: basic
    priority: 2
    pattern: |
      @First >dobj []

  - name: fourth
    label: Fourth
    type: basic
    priority: 2
    pattern: |
      [] <dobj @First
"""


def test_state_not_used_in_extract_no_state(example_docs):
    mentions = run(example_docs, FOUR_RULES, use_state=False)
    assert len(mentions) == 1
    assert len(with_label(mentions, "First")) == 1


def test_state_queries_in_basic_patterns(example_docs):
    mentions = run(example_docs, FOUR_RULES, use_state=True)
    assert len(with_label(mentions, "First")) == 1
    assert len(with_label(mentions, "Second")) == 1
    assert len(with_label(mentions, "Third")) == 1
    assert len(with_label(mentions, "Fourth")) == 1
    # the four main mentions and the promoted arg
    assert len(mentions) == 5


def test_promoted_args_retrievable_from_state(example_docs):
    grammar = """
rules:
  - name: first
    label: First
    type: event
    priority: 1
    pattern: |
      trigger = ate
      person:^Person = >nsubj []

  - name: second
    label: Second
    type: event
    priority: 2
    pattern: |
      trigger = @Person
      whatDid = <nsubj []
"""
    mentions = run(example_docs, grammar, use_state=True)
    first = with_label(mentions, "First")
    assert len(first) == 1
    assert set(first[0].arguments) == {"person"}
    persons = first[0].arguments["person"]
    assert len(persons) == 1 and persons[0].label == "Person"

    second = with_label(mentions, "Second")
    assert len(second) == 1
    assert set(second[0].arguments) == {"whatDid"}
    did = second[0].arguments["whatDid"]
    assert len(did) == 1 and (did[0].start, did[0].end) == (1, 2)  # "ate"

    # the two main mentions and the promoted args
    assert len(mentions) == 4


def test_promote_args_even_if_one_already_in_state(example_docs):
    grammar = """
rules:
  - name: first
    label: First
    type: basic
    priority: 1
    pattern: |
      Becky

  - name: second
    label: Second
    type: event
    priority: 2
    pattern: |
      trigger = ate
      arg: ^First+ = >> []
"""
    mentions = run(example_docs, grammar, use_state=True)
    # the original "Becky" plus the two promoted args ("bears" and ".")
    first = with_label(mentions, "First")
    assert len(first) == 3
    second = with_label(mentions, "Second")
    assert len(second) == 1
    assert isinstance(second[0].match, StateMatch)
    args = second[0].arguments["arg"]
    assert len(args) == 3
    assert all(isinstance(a.match, StateMatch) for a in args)


def test_promote_but_not_convert_without_state(example_docs):
    grammar = """
rules:
  - name: second
    label: Second
    type: event
    priority: 2
    pattern: |
      trigger = ate
      arg: ^First+ = >> []
"""
    mentions = run(example_docs, grammar, use_state=False)
    first = with_label(mentions, "First")
    assert len(first) == 3
    assert all(not isinstance(m.match, StateMatch) for m in first)
    second = with_label(mentions, "Second")
    assert len(second) == 1
    assert not isinstance(second[0].match, StateMatch)
    args = second[0].arguments["arg"]
    assert len(args) == 3
    assert all(not isinstance(a.match, StateMatch) for a in args)
    assert all(a.label == "First" for a in args)


def test_state_conversion_retains_named_captures(example_docs):
    """Reference OdinsonMatch.scala: StateMatch conversion keeps
    namedCaptures — an event mention stored in / returned from the state
    must still expose its argument captures (and a promoted arg keeps its
    own nested captures)."""
    grammar = """
rules:
  - name: second
    label: Second
    type: event
    priority: 2
    pattern: |
      trigger = ate
      theme = >dobj []
"""
    mentions = run(example_docs, grammar, use_state=True)
    second = with_label(mentions, "Second")
    assert len(second) == 1
    m = second[0]
    assert isinstance(m.match, StateMatch)
    caps = m.match.named_captures()
    assert [(c.name, c.match.start, c.match.end) for c in caps] == [
        ("theme", m.arguments["theme"][0].start, m.arguments["theme"][0].end)
    ]
