"""Property-based oracle: for surface patterns over single-char tokens, the
engine's selected matches must agree with a reference scan built on
Python's ``re``: at each scan position take the leftmost-first match
anchored there (``re.match`` = identical preference order), emit it, and
resume at its end (or +1 after a zero-width match). This is exactly the
reference scorer's consumption rule (OdinsonScorer.scala:56-76) — note it
differs from ``re.finditer``, which retries a non-empty match at the same
position after an empty one; the golden TSV (`(a+ | b)??` → three empties)
pins the reference behavior. Covers the quantifier/alternation semantics
space far beyond the 63 golden fixtures."""

import re

from hypothesis import given, settings, strategies as st

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import find_matches
from odinson_spark.testing import sentence_batch_from_texts

TOKENS = "abc"


@st.composite
def width1(draw):
    """Width-1 pattern: term, wildcard, or an OR of those. Quantifier bodies
    are restricted to these because reference match selection prefers a
    longer repetition over a leftmost inner clause (MatchSelector.scala:57-73
    compares RepetitionMatch lengths before descending), which diverges from
    PCRE first-match when alternatives differ in width; for width-uniform
    bodies the two orders provably coincide."""
    kind = draw(st.sampled_from(["term", "term", "or"]))
    if kind == "term":
        t = draw(st.sampled_from(TOKENS + "."))
        return ("[]", ".") if t == "." else (t, t)
    a_od, a_re = draw(width1())
    b_od, b_re = draw(width1())
    return f"({a_od} | {b_od})", f"(?:{a_re}|{b_re})"


@st.composite
def patterns(draw, depth=0):
    """(odinson_pattern, python_regex) pairs over tokens a/b/c."""
    if depth >= 3:
        choices = ["term"]
    else:
        choices = ["term", "concat", "or", "quant", "group"]
    kind = draw(st.sampled_from(choices))
    if kind == "term":
        t = draw(st.sampled_from(TOKENS + "."))
        if t == ".":
            return "[]", "."
        return t, t
    if kind == "concat":
        a_od, a_re = draw(patterns(depth + 1))
        b_od, b_re = draw(patterns(depth + 1))
        return f"{a_od} {b_od}", f"{a_re}{b_re}"
    if kind == "or":
        a_od, a_re = draw(patterns(depth + 1))
        b_od, b_re = draw(patterns(depth + 1))
        return f"({a_od} | {b_od})", f"(?:{a_re}|{b_re})"
    if kind == "quant":
        sub_od, sub_re = draw(width1())
        q = draw(st.sampled_from(["?", "*", "+", "??", "*?", "+?", "{1,2}", "{2}", "{1,3}?"]))
        return f"({sub_od}){q}", f"(?:{sub_re}){q}"
    sub_od, sub_re = draw(patterns(depth + 1))
    return f"({sub_od})", f"(?:{sub_re})"


@given(
    patterns(),
    st.text(alphabet=TOKENS, min_size=0, max_size=12),
)
@settings(max_examples=300, deadline=None)
def test_matches_agree_with_re(pat, s):
    od_pattern, py_regex = pat
    compiler = PatternCompiler()
    program = compiler.compile(od_pattern)
    text = " ".join(s)  # one char per token
    batch = sentence_batch_from_texts([text]) if s else sentence_batch_from_texts([""])
    ctx = batch.context(0)
    if not s:
        ctx = sentence_batch_from_texts([" "]).context(0)  # skip empty edge
        return
    got = [(m.start, m.end) for m in find_matches(program, ctx)]
    rx = re.compile(py_regex)
    expected = []
    p = 0
    while p <= len(s):
        m = rx.match(s, p)
        if m is None:
            p += 1
            continue
        expected.append((m.start(), m.end()))
        p = m.end() if m.end() > p else p + 1
    assert got == expected, f"pattern={od_pattern!r} regex={py_regex!r} s={s!r}"
