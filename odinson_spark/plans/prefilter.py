"""Rule → sentence-level prefilter predicate.

This is the engine's "custom optimizer rule", implemented as query
construction (not a JVM Catalyst extension): from a compiled pattern we
derive a conservative necessary condition — a boolean combination of
``array_contains`` tests over token-layer columns and edge-label set columns
— and apply it as a DataFrame ``filter`` *before* the matcher UDF. Catalyst
pushes it into the scan (parquet/Iceberg row-group skipping via column
stats), so the expensive Python stage only sees sentences that can possibly
match.

It generalizes two reference mechanisms:
* Lucene's postings-driven skipping (only docs containing required terms are
  visited — lucene/search/*),
* traversal anchor pushdown (a traversal's first/last step forces an
  incoming/outgoing label on src/dst tokens —
  compiler/QueryCompiler.scala:544-615).

Soundness invariant: prefilter(s) is *necessary* for a match — never drops a
sentence the matcher would accept. Anything uncertain maps to TRUE.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

from ..lang import ast
from ..lang.normalize import normalize_unicode, normalize_unicode_aggressively
from ..match import program as prog


# --- predicate tree --------------------------------------------------------


@dataclass(frozen=True)
class PFTrue:
    pass


@dataclass(frozen=True)
class PFFalse:
    pass


@dataclass(frozen=True)
class PFTerm:
    field: str
    value: str


@dataclass(frozen=True)
class PFEdge:
    label: str  # an edge with this label must exist in the sentence


@dataclass(frozen=True)
class PFAnd:
    subs: Tuple[object, ...]


@dataclass(frozen=True)
class PFOr:
    subs: Tuple[object, ...]


def pf_and(subs) -> object:
    flat = []
    for s in subs:
        if isinstance(s, PFTrue):
            continue
        if isinstance(s, PFFalse):
            return PFFalse()
        if isinstance(s, PFAnd):
            flat.extend(s.subs)
        else:
            flat.append(s)
    flat = list(dict.fromkeys(flat))
    if not flat:
        return PFTrue()
    if len(flat) == 1:
        return flat[0]
    return PFAnd(tuple(flat))


def pf_or(subs) -> object:
    flat = []
    for s in subs:
        if isinstance(s, PFTrue):
            return PFTrue()
        if isinstance(s, PFFalse):
            continue
        if isinstance(s, PFOr):
            flat.extend(s.subs)
        else:
            flat.append(s)
    flat = list(dict.fromkeys(flat))
    if not flat:
        return PFFalse()
    if len(flat) == 1:
        return flat[0]
    return PFOr(tuple(flat))


# --- analysis ---------------------------------------------------------------


def _mask_pf(expr, default_field: str) -> object:
    if isinstance(expr, prog.LeafMask):
        if expr.fuzzy or not isinstance(expr.matcher, ast.StringMatcher):
            return PFTrue()
        if expr.field == default_field:
            term = normalize_unicode_aggressively(expr.matcher.string)
        else:
            term = normalize_unicode(expr.matcher.string)
        return PFTerm(expr.field, term)
    if isinstance(expr, prog.AndMask):
        return pf_and([_mask_pf(s, default_field) for s in expr.subs])
    if isinstance(expr, prog.OrMask):
        return pf_or([_mask_pf(s, default_field) for s in expr.subs])
    if isinstance(expr, prog.FalseMask):
        return PFFalse()
    # NotMask / TrueMask / regex — unconstrained
    return PFTrue()


def _traversal_pf(tr) -> object:
    t = type(tr)
    if t is ast.OutgoingTraversal or t is ast.IncomingTraversal:
        if isinstance(tr.matcher, ast.StringMatcher):
            return PFEdge(normalize_unicode(tr.matcher.string))
        return PFTrue()
    if t is ast.ConcatenatedTraversal:
        return pf_and([_traversal_pf(s) for s in tr.traversals])
    if t is ast.DisjunctiveTraversal:
        return pf_or([_traversal_pf(s) for s in tr.traversals])
    return PFTrue()  # wildcards, optional, kleene star, no-traversal


def _ft_pf(ft, default_field: str) -> object:
    if isinstance(ft, prog.SingleStepFT):
        return pf_and(
            [_traversal_pf(ft.traversal), prefilter_of(ft.surface, default_field)]
        )
    if isinstance(ft, prog.ConcatFT):
        return pf_and([_ft_pf(c, default_field) for c in ft.clauses])
    if isinstance(ft, prog.RepeatFT):
        if ft.min > 0:
            return _ft_pf(ft.sub, default_field)
        return PFTrue()
    return PFTrue()


def prefilter_of(p: prog.Prog, default_field: str = "norm") -> object:
    t = type(p)
    if t is prog.PToken:
        return _mask_pf(p.expr, default_field)
    if t is prog.PFail:
        return PFFalse()
    if t is prog.PConcat:
        return pf_and([prefilter_of(c, default_field) for c in p.clauses])
    if t is prog.POr:
        return pf_or([prefilter_of(c, default_field) for c in p.clauses])
    if t is prog.PRepeat:
        return prefilter_of(p.sub, default_field)  # min >= 1 by construction
    if t is prog.POptional:
        return PFTrue()
    if t is prog.PNamedCapture:
        return prefilter_of(p.sub, default_field)
    if t is prog.PLookahead or t is prog.PLookbehind:
        return prefilter_of(p.sub, default_field) if p.positive else PFTrue()
    if t is prog.PFilter:
        return pf_and(
            [prefilter_of(p.main, default_field), prefilter_of(p.filter, default_field)]
        )
    if t is prog.PExpand:
        return prefilter_of(p.sub, default_field)
    if t is prog.PGraphTraversal:
        return pf_and(
            [prefilter_of(p.src, default_field), _ft_pf(p.full_traversal, default_field)]
        )
    if t is prog.PEvent:
        parts = [prefilter_of(p.trigger, default_field)]
        for arg in p.required:
            parts.append(_ft_pf(arg.full_traversal, default_field))
        return pf_and(parts)
    # PAllNGrams, PMention, PSentenceStart/End — unconstrained
    return PFTrue()


# --- rendering ---------------------------------------------------------------


# the sentence table stores per-token incoming/outgoing label lists flattened
# to a sentence-level label set; a [incoming=l]/[outgoing=l] token constraint
# implies the label exists somewhere in the sentence
_FIELD_TO_COLUMN = {"incoming": "incoming_flat", "outgoing": "outgoing_flat"}


def to_spark_column(pf, columns=None):
    """``columns``: the sentence table's column list, if known — enables the
    norm synonym-union rendering (norm OR norm_alt) without breaking tables
    that predate the norm_alt column."""
    from pyspark.sql import functions as F

    if isinstance(pf, PFTrue):
        return F.lit(True)
    if isinstance(pf, PFFalse):
        return F.lit(False)
    if isinstance(pf, PFTerm):
        col = F.array_contains(
            F.col(_FIELD_TO_COLUMN.get(pf.field, pf.field)), pf.value
        )
        if pf.field == "norm" and columns is not None and "norm_alt" in columns:
            # default field is a synonym union; norm_alt is null unless it
            # differs from norm, hence the coalesce
            col = col | F.coalesce(
                F.array_contains(F.col("norm_alt"), pf.value), F.lit(False)
            )
        return col
    if isinstance(pf, PFEdge):
        return F.array_contains(F.col("outgoing_flat"), pf.label)
    if isinstance(pf, PFAnd):
        col = to_spark_column(pf.subs[0], columns)
        for s in pf.subs[1:]:
            col = col & to_spark_column(s, columns)
        return col
    if isinstance(pf, PFOr):
        col = to_spark_column(pf.subs[0], columns)
        for s in pf.subs[1:]:
            col = col | to_spark_column(s, columns)
        return col
    raise TypeError(f"unknown prefilter {pf!r}")


def to_sql(pf, columns=None) -> str:
    if isinstance(pf, PFTrue):
        return "TRUE"
    if isinstance(pf, PFFalse):
        return "FALSE"
    if isinstance(pf, PFTerm):
        v = pf.value.replace("'", "''")
        sql = f"array_contains({_FIELD_TO_COLUMN.get(pf.field, pf.field)}, '{v}')"
        if pf.field == "norm" and columns is not None and "norm_alt" in columns:
            sql = f"({sql} OR coalesce(array_contains(norm_alt, '{v}'), FALSE))"
        return sql
    if isinstance(pf, PFEdge):
        v = pf.label.replace("'", "''")
        return f"array_contains(outgoing_flat, '{v}')"
    if isinstance(pf, PFAnd):
        return "(" + " AND ".join(to_sql(s, columns) for s in pf.subs) + ")"
    if isinstance(pf, PFOr):
        return "(" + " OR ".join(to_sql(s, columns) for s in pf.subs) + ")"
    raise TypeError(f"unknown prefilter {pf!r}")
