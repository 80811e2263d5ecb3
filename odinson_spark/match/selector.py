"""Match selection — the greedy/lazy/leftmost disambiguation semantics.

This is the subtlest correctness surface of the whole engine and is ported
as a pure-Python module with the reference as the behavioral oracle
(/root/reference/core/src/main/scala/ai/lum/odinson/lucene/search/MatchSelector.scala:8-198):

* among candidates sharing a start position, walk the two derivation trees
  in lockstep: lower OR clauseID wins, longer wins for greedy
  optional/repetition, shorter for lazy, identical spans keep the left;
* overlapping matches with different starts keep the leftmost;
* disjoint matches are both kept;
* EventSketches are then *packaged* into concrete EventMatches (bucket
  argument matches by interval overlap, pick per-bucket winners, apply
  argument quantifiers via combinations, cartesian-product across args).

The scorer-level consumption loop (non-overlapping left-to-right scan) lives
in :mod:`odinson_spark.match.engine`.
"""

from __future__ import annotations

from itertools import combinations, product
from typing import List, Optional, Sequence

from .matches import (
    BaseMatch,
    ConcatMatch,
    EventMatch,
    EventSketch,
    GraphTraversalMatch,
    NGramMatch,
    NamedCaptureView,
    NamedMatch,
    OptionalMatch,
    OrMatch,
    RepetitionMatch,
    StateMatch,
)


def pick_matches(matches: Sequence[BaseMatch]) -> List[BaseMatch]:
    selected: List[BaseMatch] = []
    for m in reversed(matches):
        if selected:
            head, *rest = selected
            selected = _pick_from_pair(m, head) + rest
        else:
            selected = [m]
    out: List[BaseMatch] = []
    for m in selected:
        if isinstance(m, EventSketch):
            out.extend(package_events(m))
        else:
            out.append(m)
    return out


def _pick_from_pair(lhs: BaseMatch, rhs: BaseMatch) -> List[BaseMatch]:
    if lhs.start == rhs.start:
        if lhs.end == rhs.end:
            return [lhs]
        return _traverse(lhs, rhs, [lhs], [rhs])
    if lhs.intersects(rhs):
        return [lhs]
    return [lhs, rhs]


def _traverse(lhs, rhs, left: List[BaseMatch], right: List[BaseMatch]) -> List[BaseMatch]:
    while True:
        if left and right:
            l, r = left[0], right[0]
            if isinstance(l, OrMatch) and isinstance(r, OrMatch):
                if l.clause_id < r.clause_id:
                    return [lhs]
                if l.clause_id > r.clause_id:
                    return [rhs]
                left = [l.sub] + left[1:]
                right = [r.sub] + right[1:]
                continue
            if isinstance(l, OptionalMatch) and isinstance(r, OptionalMatch):
                if l.greedy and r.greedy:
                    if l.length > r.length:
                        return [lhs]
                    if l.length < r.length:
                        return [rhs]
                else:
                    # mirrors the reference's else-branch (treated as lazy):
                    # shorter wins
                    if l.length < r.length:
                        return [lhs]
                    if l.length > r.length:
                        return [rhs]
                left = [l.sub] + left[1:]
                right = [r.sub] + right[1:]
                continue
            if isinstance(l, RepetitionMatch) and isinstance(r, RepetitionMatch):
                if l.greedy and r.greedy:
                    if l.length > r.length:
                        return [lhs]
                    if l.length < r.length:
                        return [rhs]
                else:
                    if l.length < r.length:
                        return [lhs]
                    if l.length > r.length:
                        return [rhs]
                left = list(l.subs) + left[1:]
                right = list(r.subs) + right[1:]
                continue
            left = _expand_first(left)
            right = _expand_first(right)
            continue
        if not left and not right:
            return [lhs, rhs]
        # derivations of different shapes exhausted asymmetrically; the
        # reference would throw here — prefer the left candidate instead
        return [lhs]


def _expand_first(ms: List[BaseMatch]) -> List[BaseMatch]:
    if not ms:
        return ms
    head, tail = ms[0], ms[1:]
    if isinstance(head, NGramMatch):
        return tail
    if isinstance(head, EventSketch):
        return [head.trigger] + tail
    if isinstance(head, OrMatch):
        return [head.sub] + tail
    if isinstance(head, NamedMatch):
        return [head.sub] + tail
    if isinstance(head, OptionalMatch):
        return [head.sub] + tail
    if isinstance(head, ConcatMatch):
        return list(head.subs) + tail
    if isinstance(head, RepetitionMatch):
        return list(head.subs) + tail
    if isinstance(head, GraphTraversalMatch):
        return [head.src, head.dst] + tail
    if isinstance(head, StateMatch):
        if not head.captures:
            return tail
        return [NGramMatch(head.start, head.end)] + tail
    if isinstance(head, EventMatch):
        return [NGramMatch(head.start, head.end)] + tail
    return tail


# ---------------------------------------------------------------------------
# event packaging (MatchSelector.scala:131-198)
# ---------------------------------------------------------------------------


def package_events(sketch: EventSketch) -> List[EventMatch]:
    packages = _package_arguments(sketch.arg_sketches)
    meta = sketch.argument_metadata()
    return [EventMatch(sketch.trigger, tuple(caps), meta) for caps in packages]


def _package_arguments(arg_sketches) -> List[List[NamedCaptureView]]:
    by_arg = {}
    order = []
    for spec, m in arg_sketches:
        if spec not in by_arg:
            by_arg[spec] = []
            order.append(spec)
        by_arg[spec].append(m)
    packaged = [_package_argument(spec, by_arg[spec]) for spec in order]
    if not packaged:
        return [[]]
    out = []
    for combo in product(*packaged):
        caps: List[NamedCaptureView] = []
        for group in combo:
            caps.extend(group)
        out.append(caps)
    return out


def _package_argument(spec, all_matches: List[BaseMatch]) -> List[List[NamedCaptureView]]:
    matches: List[BaseMatch] = []
    for g in _group_matches(all_matches):
        matches.extend(pick_matches(g))
    mn, mx = spec.min, spec.max
    if mx is not None and mn == mx:
        packages = [list(c) for c in combinations(matches, mn)]
    elif mx is not None:
        if len(matches) < mn:
            packages = []
        elif len(matches) > mx:
            packages = [list(c) for c in combinations(matches, mx)]
        else:
            packages = [matches]
    else:
        packages = [] if len(matches) < mn else [matches]
    name, label = spec.name, spec.label
    return [[NamedCaptureView(name, label, m) for m in pkg] for pkg in packages]


def _group_matches(matches: Sequence[BaseMatch]) -> List[List[BaseMatch]]:
    """Bucket matches by interval overlap (first-fit, insertion order)."""
    buckets: List[List[BaseMatch]] = []
    for m in matches:
        placed = False
        for b in buckets:
            if m.intersects(b[0]):
                b.append(m)
                placed = True
                break
        if not placed:
            buckets.append([m])
    return buckets
