"""Golden surface-pattern corpus (ported verbatim from the reference test
resources: core/src/test/resources/patternsThatMatch.tsv, driven by
core/src/test/scala/.../patterns/TestPatterns.scala:7-26). The expected
column splits on ';' keeping trailing empties (zero-width matches)."""

import pathlib

import pytest

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import find_matches
from odinson_spark.testing import match_strings, sentence_batch_from_texts

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "patterns_that_match.tsv"


def load_cases():
    lines = FIXTURE.read_text().splitlines()
    cases = []
    for line in lines[1:]:
        pattern, string, expected = line.strip().split("\t")
        cases.append((pattern.strip(), string.strip(), expected.split(";")))
    return cases


CASES = load_cases()


@pytest.mark.parametrize("pattern,text,expected", CASES, ids=[c[0] + "/" + c[1] for c in CASES])
def test_golden_pattern(pattern, text, expected):
    compiler = PatternCompiler()
    program = compiler.compile(pattern)
    batch = sentence_batch_from_texts([text])
    ctx = batch.context(0)
    matches = find_matches(program, ctx)
    tokens = text.split()
    assert match_strings(tokens, matches) == expected
