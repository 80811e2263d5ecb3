"""Sentence-level query execution: candidate enumeration + the scorer's
non-overlapping left-to-right consumption loop
(parity: /root/reference/core/src/main/scala/ai/lum/odinson/lucene/search/OdinsonScorer.scala:27-76,
disableMatchSelector variant :126-153).

This module is pure Python/numpy — no Spark imports — so the full golden
fixture suite runs without a JVM. The Spark layer calls :func:`find_matches`
per sentence from inside an Arrow batch.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from .context import SentenceContext
from .matches import BaseMatch, EventMatch, EventSketch
from .program import Prog
from .selector import package_events, pick_matches


def candidate_matches(program: Prog, ctx: SentenceContext) -> List[BaseMatch]:
    """All candidate matches, in (start, preference) order."""
    return program.all_matches(ctx)


def find_matches(
    program: Prog,
    ctx: SentenceContext,
    disable_match_selector: bool = False,
) -> List[BaseMatch]:
    cands = candidate_matches(program, ctx)
    if disable_match_selector:
        out: List[BaseMatch] = []
        for m in cands:
            if isinstance(m, EventSketch):
                out.extend(package_events(m))
            else:
                out.append(m)
        return out
    out = []
    i = 0
    n = len(cands)
    while i < n:
        start = cands[i].start
        j = i
        while j < n and cands[j].start == start:
            j += 1
        selected = pick_matches(cands[i:j])
        out.extend(selected)
        # skip any candidate starting before the last selected match ends
        skip_end = selected[-1].end if selected else start
        i = j
        while i < n and cands[i].start < skip_end:
            i += 1
    return out


def filter_trigger_overlaps(matches: Sequence[BaseMatch]) -> List[BaseMatch]:
    """Drop event arguments overlapping their trigger; drop events whose
    required-arg counts fall below minimum
    (reference ExtractorEngine.scala:579-588, OdinsonMatch.scala:72-83)."""
    out: List[BaseMatch] = []
    for m in matches:
        if isinstance(m, EventMatch):
            kept = m.remove_trigger_overlaps()
            if kept is not None:
                out.append(kept)
        else:
            out.append(m)
    return out
