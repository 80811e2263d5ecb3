"""AST for the Odinson-compatible rule language.

Node inventory mirrors the reference grammar so that every construct the
reference can parse has a counterpart here (parity map:
/root/reference/core/src/main/scala/ai/lum/odinson/compiler/Ast.scala).
The classes are plain frozen dataclasses; compilation to an executable
program happens in :mod:`odinson_spark.lang.compiler`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, List, Tuple


# ---------------------------------------------------------------------------
# matchers (string / regex), used by token constraints and edge-label matchers
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StringMatcher:
    string: str


@dataclass(frozen=True)
class RegexMatcher:
    pattern: str


Matcher = object  # StringMatcher | RegexMatcher


# ---------------------------------------------------------------------------
# token constraints
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Wildcard:
    pass


@dataclass(frozen=True)
class FieldConstraint:
    name: str
    matcher: object


@dataclass(frozen=True)
class FuzzyConstraint:
    """Edit-distance term match (``dog~``); reference: Lucene FuzzyQuery."""

    name: str
    matcher: StringMatcher


@dataclass(frozen=True)
class NegatedConstraint:
    constraint: object


@dataclass(frozen=True)
class ConjunctiveConstraint:
    constraints: Tuple[object, ...]


@dataclass(frozen=True)
class DisjunctiveConstraint:
    constraints: Tuple[object, ...]


# ---------------------------------------------------------------------------
# assertions
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SentenceStartAssertion:
    pass


@dataclass(frozen=True)
class SentenceEndAssertion:
    pass


@dataclass(frozen=True)
class PositiveLookaheadAssertion:
    pattern: object


@dataclass(frozen=True)
class NegativeLookaheadAssertion:
    pattern: object


@dataclass(frozen=True)
class PositiveLookbehindAssertion:
    pattern: object


@dataclass(frozen=True)
class NegativeLookbehindAssertion:
    pattern: object


# ---------------------------------------------------------------------------
# surface patterns
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AssertionPattern:
    assertion: object


@dataclass(frozen=True)
class ConstraintPattern:
    constraint: object


@dataclass(frozen=True)
class DisjunctivePattern:
    patterns: Tuple[object, ...]


@dataclass(frozen=True)
class ConcatenatedPattern:
    patterns: Tuple[object, ...]


@dataclass(frozen=True)
class NamedCapturePattern:
    name: str
    label: Optional[str]
    pattern: object


@dataclass(frozen=True)
class MentionPattern:
    """``@Label`` — spans of previously-found mentions (state lookup)."""

    arg_name: Optional[str]
    label: str


@dataclass(frozen=True)
class GreedyRepetitionPattern:
    pattern: object
    min: int
    max: Optional[int]


@dataclass(frozen=True)
class LazyRepetitionPattern:
    pattern: object
    min: int
    max: Optional[int]


@dataclass(frozen=True)
class FilterPattern:
    """Spans of ``main`` kept iff they contain a span of ``filter``."""

    main: object
    filter: object


@dataclass(frozen=True)
class ExpandPattern:
    """``(?^ …)`` — widen a graph-traversal match to cover src+dst extents."""

    pattern: object


@dataclass(frozen=True)
class GraphTraversalPattern:
    src: object
    full_traversal: object


# ---------------------------------------------------------------------------
# graph traversals
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NoTraversal:
    pass


@dataclass(frozen=True)
class IncomingWildcard:
    pass


@dataclass(frozen=True)
class OutgoingWildcard:
    pass


@dataclass(frozen=True)
class IncomingTraversal:
    matcher: object


@dataclass(frozen=True)
class OutgoingTraversal:
    matcher: object


@dataclass(frozen=True)
class ConcatenatedTraversal:
    traversals: Tuple[object, ...]


@dataclass(frozen=True)
class DisjunctiveTraversal:
    traversals: Tuple[object, ...]


@dataclass(frozen=True)
class OptionalTraversal:
    traversal: object


@dataclass(frozen=True)
class KleeneStarTraversal:
    traversal: object


# ---------------------------------------------------------------------------
# full traversal = alternating (edge traversal, surface pattern) steps
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SingleStepFullTraversalPattern:
    traversal: object
    surface: object


@dataclass(frozen=True)
class ConcatFullTraversalPattern:
    clauses: Tuple[object, ...]


@dataclass(frozen=True)
class RepeatFullTraversalPattern:
    min: int
    max: int  # use a large sentinel for unbounded
    full_traversal: object


UNBOUNDED = 2**31 - 1


def full_traversal_is_required(ft) -> bool:
    if isinstance(ft, RepeatFullTraversalPattern):
        return ft.min > 0
    return True


def add_mention_filter_to_terminals(ft, mention: MentionPattern, allow_promotion: bool):
    """Constrain the terminal surface patterns of a full traversal to a state
    mention (reference: Ast.scala addMentionFilterToTerminals)."""
    if isinstance(ft, SingleStepFullTraversalPattern):
        if allow_promotion:
            new_pattern = DisjunctivePattern(
                (FilterPattern(mention, ft.surface), ft.surface)
            )
        else:
            new_pattern = FilterPattern(mention, ft.surface)
        return SingleStepFullTraversalPattern(ft.traversal, new_pattern)
    if isinstance(ft, ConcatFullTraversalPattern):
        # walk backwards, filtering until (and including) the first required step
        out: List[object] = []
        remaining = list(reversed(ft.clauses))
        i = 0
        while i < len(remaining):
            head = remaining[i]
            f = add_mention_filter_to_terminals(head, mention, allow_promotion)
            out.append(f)
            i += 1
            if full_traversal_is_required(head):
                out.extend(remaining[i:])
                break
        return ConcatFullTraversalPattern(tuple(reversed(out)))
    if isinstance(ft, RepeatFullTraversalPattern):
        mn, mx = ft.min, ft.max
        if (mn, mx) == (0, 1):
            step = add_mention_filter_to_terminals(ft.full_traversal, mention, allow_promotion)
            return RepeatFullTraversalPattern(0, 1, step)
        if mn == 0:
            new_rep = RepeatFullTraversalPattern(0, mx - 1, ft.full_traversal)
            last = add_mention_filter_to_terminals(ft.full_traversal, mention, allow_promotion)
            pattern = ConcatFullTraversalPattern((new_rep, last))
            return RepeatFullTraversalPattern(0, 1, pattern)
        if (mn, mx) == (1, 1):
            return add_mention_filter_to_terminals(ft.full_traversal, mention, allow_promotion)
        new_rep = RepeatFullTraversalPattern(mn - 1, mx - 1, ft.full_traversal)
        last = add_mention_filter_to_terminals(ft.full_traversal, mention, allow_promotion)
        return ConcatFullTraversalPattern((new_rep, last))
    raise TypeError(f"unknown full traversal node: {ft!r}")


# ---------------------------------------------------------------------------
# events
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ArgumentPattern:
    name: str
    label: Optional[str]
    full_traversal: object
    min: int
    max: Optional[int]
    promote: bool


@dataclass(frozen=True)
class EventPattern:
    trigger: object
    arguments: Tuple[ArgumentPattern, ...] = field(default_factory=tuple)

    def __post_init__(self):
        names = [a.name for a in self.arguments]
        if len(set(names)) < len(names):
            raise ValueError("multiple arguments with the same name in EventPattern")
