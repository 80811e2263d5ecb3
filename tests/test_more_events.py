"""Parity: events/TestMoreEvents.scala (chopsticks-spoon fixture — argument
quantifiers over optional traversals, multi-argument packaging, required-arg
filtering across sentences)."""

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import filter_trigger_overlaps, find_matches
from odinson_spark.testing import batch_from_doc_json


def run_per_sentence(example_docs, doc_key, pattern):
    """matches per sentence (the reference's per-scoreDoc grouping)."""
    program = PatternCompiler().compile(pattern)
    batch = batch_from_doc_json(example_docs[doc_key])
    out = []
    for i in range(batch.n_sentences):
        ctx = batch.context(i)
        out.append(filter_trigger_overlaps(find_matches(program, ctx)))
    return [ms for ms in out if ms]


def args_of(m):
    return sorted((c.name, c.match.start, c.match.end) for c in m.captures)


def trig(m):
    return (m.trigger.start, m.trigger.end)


PAT_ONE_TOOL = """
trigger = [lemma=eat]
theme: ^food = >dobj
tool: ^tool = >nmod_with >conj?
"""


def test_two_events_with_one_tool_each(example_docs):
    hits = run_per_sentence(example_docs, "chopsticks-spoon", PAT_ONE_TOOL)
    assert len(hits) == 1  # totalHits == 1
    m1, m2 = sorted(hits[0], key=args_of)
    assert trig(m1) == trig(m2) == (1, 2)
    assert args_of(m1) == [("theme", 2, 3), ("tool", 4, 5)]
    assert args_of(m2) == [("theme", 2, 3), ("tool", 7, 8)]


def test_one_event_with_two_tools(example_docs):
    pattern = """
trigger = [lemma=eat]
theme: ^food = >dobj
tool: ^tool+ = >nmod_with >conj?
"""
    hits = run_per_sentence(example_docs, "chopsticks-spoon", pattern)
    assert len(hits) == 1
    (m1,) = hits[0]
    assert trig(m1) == (1, 2)
    assert args_of(m1) == [("theme", 2, 3), ("tool", 4, 5), ("tool", 7, 8)]


def test_two_events_one_with_two_tools_one_with_zero(example_docs):
    pattern = """
trigger = [lemma=eat]
theme: ^food = >dobj
tool: ^tool* = >nmod_with >conj?
"""
    hits = run_per_sentence(example_docs, "chopsticks-spoon", pattern)
    assert len(hits) == 2  # totalHits == 2
    (m1,) = hits[0]
    assert trig(m1) == (1, 2)
    assert args_of(m1) == [("theme", 2, 3), ("tool", 4, 5), ("tool", 7, 8)]
    (m2,) = hits[1]
    assert trig(m2) == (1, 2)
    assert args_of(m2) == [("theme", 2, 3)]


def test_two_events_with_one_tool_each_optional_theme(example_docs):
    pattern = """
trigger = [lemma=eat]
theme: ^food? = >dobj
tool: ^tool = >nmod_with >conj?
"""
    hits = run_per_sentence(example_docs, "chopsticks-spoon", pattern)
    assert len(hits) == 1
    m1, m2 = sorted(hits[0], key=args_of)
    assert args_of(m1) == [("theme", 2, 3), ("tool", 4, 5)]
    assert args_of(m2) == [("theme", 2, 3), ("tool", 7, 8)]


def test_no_events_with_both_tool_and_location(example_docs):
    pattern = """
trigger = [lemma=eat]
theme: ^food = >dobj
tool: ^tool = >nmod_with >conj?
location: ^place = >nmod_at
"""
    hits = run_per_sentence(example_docs, "chopsticks-spoon", pattern)
    assert hits == []


def test_three_events_when_all_args_optional(example_docs):
    pattern = """
trigger = [lemma=eat]
theme: ^food? = >dobj
tool: ^tool? = >nmod_with >conj?
location: ^place? = >nmod_at
"""
    hits = run_per_sentence(example_docs, "chopsticks-spoon", pattern)
    assert len(hits) == 2
    m1, m2 = sorted(hits[0], key=args_of)
    assert args_of(m1) == [("theme", 2, 3), ("tool", 4, 5)]
    assert args_of(m2) == [("theme", 2, 3), ("tool", 7, 8)]
    (m3,) = hits[1]
    assert trig(m3) == (1, 2)
    assert args_of(m3) == [("location", 5, 6), ("theme", 2, 3)]


def test_one_event_with_required_location(example_docs):
    pattern = """
trigger = [lemma=eat]
theme: ^food = >dobj
tool: ^tool? = >nmod_with >conj?
location: ^place = >nmod_at
"""
    hits = run_per_sentence(example_docs, "chopsticks-spoon", pattern)
    assert len(hits) == 1
    (m1,) = hits[0]
    assert trig(m1) == (1, 2)
    assert args_of(m1) == [("location", 5, 6), ("theme", 2, 3)]
