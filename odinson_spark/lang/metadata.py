"""Metadata query language → Catalyst predicates.

Grammar parity with the reference's document-metadata filter language
(/root/reference/core/src/main/scala/ai/lum/odinson/metadata/QueryParser.scala,
Ast.scala): `&&`, `||`, `!( … )`, chained comparisons
(`2000 <= year <= 2010`), `field contains 'str'`, `field not contains`,
`nested{ … }` blocks, and the `date(y, m, d)` function plus the `.year`
attribute sugar.

The compiler output is a single pyspark ``Column``; Catalyst pushes it into
the scan (partition pruning + row-group skipping) — the reference needs a
Lucene block-join for nested fields (MetadataCompiler.scala:116-131); here a
nested block compiles to ``exists(field, e -> …)`` over an array-of-struct
column, no join at all.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from .normalize import fold_string_column, normalize_unicode_aggressively
from .parser import _P, ParseError


# --- AST ---------------------------------------------------------------------


@dataclass(frozen=True)
class OrExpr:
    clauses: Tuple[object, ...]


@dataclass(frozen=True)
class AndExpr:
    clauses: Tuple[object, ...]


@dataclass(frozen=True)
class NotExpr:
    expr: object


@dataclass(frozen=True)
class Cmp:
    op: str  # < <= > >= ==
    lhs: object
    rhs: object


@dataclass(frozen=True)
class Nested:
    name: str
    expr: object


@dataclass(frozen=True)
class Contains:
    field: "FieldValue"
    value: "StringValue"


@dataclass(frozen=True)
class NumberValue:
    n: float


@dataclass(frozen=True)
class StringValue:
    s: str

    @property
    def norm(self) -> str:
        return normalize_unicode_aggressively(self.s)


@dataclass(frozen=True)
class FunCall:
    name: str
    args: Tuple[object, ...]


@dataclass(frozen=True)
class FieldValue:
    name: str


# --- parser -------------------------------------------------------------------


class MetadataQueryParser:
    def parse(self, query: str):
        p = _P(query.strip())
        expr = self.or_expression(p)
        if not p.eof():
            p.err("unconsumed input in metadata query")
        return expr

    def or_expression(self, p: _P):
        clauses = [self.and_expression(p)]
        while p.take("||"):
            clauses.append(self.and_expression(p))
        return clauses[0] if len(clauses) == 1 else OrExpr(tuple(clauses))

    def and_expression(self, p: _P):
        clauses = [self.atomic_expression(p)]
        while p.take("&&"):
            clauses.append(self.atomic_expression(p))
        return clauses[0] if len(clauses) == 1 else AndExpr(tuple(clauses))

    def atomic_expression(self, p: _P):
        for fn in (
            self.cmp_expression,
            self.group_expression,
            self.nested_expression,
            self.contains_expression,
        ):
            save = p.pos
            try:
                return fn(p)
            except ParseError:
                p.pos = save
        p.err("expected metadata expression")

    def group_expression(self, p: _P):
        negated = p.take("!")
        p.expect("(")
        expr = self.or_expression(p)
        p.expect(")")
        return NotExpr(expr) if negated else expr

    def nested_expression(self, p: _P):
        name = p.identifier()
        if name is None:
            p.err("expected nested field name")
        p.expect("{")
        expr = self.or_expression(p)
        p.expect("}")
        return Nested(name, expr)

    def contains_expression(self, p: _P):
        field = self.field_value(p)
        negated = p.take("not")
        p.expect("contains")
        s = p.quoted_string()
        if s is None:
            p.err("expected quoted string after contains")
        c = Contains(field, StringValue(s))
        return NotExpr(c) if negated else c

    def field_value(self, p: _P) -> FieldValue:
        name = p.identifier()
        if name is None:
            p.err("expected field name")
        if p.peek("."):
            p.expect(".")
            attr = p.identifier()
            if attr is None:
                p.err("expected attribute name")
            return FieldValue(f"{name}.{attr}")
        return FieldValue(name)

    _OPS = (">=", "<=", "==", "!=", ">", "<")

    def _cmp_op(self, p: _P) -> Optional[str]:
        for op in self._OPS:
            if p.take(op):
                return op
        return None

    def cmp_expression(self, p: _P):
        lhs = self.value(p)
        op = self._cmp_op(p)
        if op is None:
            p.err("expected comparison operator")
        rhs = self.value(p)
        clauses = [self._mk(op, lhs, rhs)]
        prev = rhs
        while True:
            save = p.pos
            op2 = self._cmp_op(p)
            if op2 is None:
                break
            try:
                nxt = self.value(p)
            except ParseError:
                p.pos = save
                break
            clauses.append(self._mk(op2, prev, nxt))
            prev = nxt
        return clauses[0] if len(clauses) == 1 else AndExpr(tuple(clauses))

    @staticmethod
    def _mk(op: str, lhs, rhs):
        if op == "!=":
            return NotExpr(Cmp("==", lhs, rhs))
        return Cmp(op, lhs, rhs)

    def value(self, p: _P):
        save = p.pos
        name = p.identifier()
        if name is not None:
            if p.peek("("):
                p.expect("(")
                args = []
                if not p.peek(")"):
                    args.append(self.value(p))
                    while p.take(","):
                        args.append(self.value(p))
                p.expect(")")
                return FunCall(name, tuple(args))
            # field attribute sugar: field.attr
            if p.peek("."):
                p.expect(".")
                attr = p.identifier()
                if attr is None:
                    p.err("expected attribute name")
                return FieldValue(f"{name}.{attr}")
            return FieldValue(name)
        p.pos = save
        s = p.quoted_string()
        if s is not None:
            return StringValue(s)
        n = p.unsigned_int()
        if n is not None:
            return NumberValue(float(n))
        p.err("expected value")


# --- compiler → pyspark Column -------------------------------------------------


def compile_metadata_query(query: str, field_prefix: str = ""):
    """Parse and compile to a pyspark Column predicate. Column names are the
    metadata field names (optionally prefixed, e.g. ``meta_``); ``x.year``
    compiles to ``year(x)``; ``date(y, m, d)`` to a date literal."""
    expr = MetadataQueryParser().parse(query)
    return _compile(expr, field_prefix)


_MONTHS = (
    "january february march april may june july august september october "
    "november december"
).split()


def _month_number(s: str) -> int:
    """Month-name argument of date(): full names or unambiguous prefixes
    (≥3 chars), case-insensitive (reference: date(2015, 'Mar', 25))."""
    key = s.strip().lower()
    if len(key) >= 3:
        for i, name in enumerate(_MONTHS):
            if name.startswith(key):
                return i + 1
    raise ValueError(f"unknown month name {s!r}")


import re as _re

_REGEX_PART = _re.compile(r"^/(.+)/$")


def _phrase_regex_body(value: str):
    """The reference allows /regex/ tokens inside metadata string values
    ('Jose /Ma.*/'): each whitespace part matches one token, regex parts
    full-match their token. Returns the case-blind phrase body over the
    folded joined-token string, or None if the value has no regex parts."""
    parts = value.split()
    if not any(_REGEX_PART.match(p) for p in parts):
        return None
    out = []
    for p in parts:
        m = _REGEX_PART.match(p)
        if m:
            out.append(f"(?:{m.group(1)})")
        else:
            out.append(_re.escape(normalize_unicode_aggressively(p)))
    return " ".join(out)


def _phrase_regex(value: str):
    body = _phrase_regex_body(value)
    return None if body is None else "(?i)^" + body + "$"


def _string_eq(col_folded, sval: "StringValue"):
    """Exact text-metadata equality: whole joined-token string equality, or
    anchored per-token regex when the value embeds /regex/ parts."""
    from pyspark.sql import functions as F

    pattern = _phrase_regex(sval.s)
    if pattern is not None:
        return col_folded.rlike(pattern)
    return col_folded == F.lit(sval.norm)


def _string_contains(col_folded, sval: "StringValue"):
    """Token-boundary phrase containment (the reference compiles contains to
    a Lucene phrase query over tokens): 'Jose' matches within 'Jose Manuel',
    'Manuel Jose' and partial tokens ('ose') do not. /regex/ token parts are
    allowed, same as == (TestOdinsonMetadataQuery.scala:36-43
    "character contains '/S.*/ Agent'")."""
    from pyspark.sql import functions as F

    body = _phrase_regex_body(sval.s)
    if body is not None:
        # unanchored phrase at token boundaries
        return col_folded.rlike(r"(?i)(?:^|(?<= ))" + body + r"(?= |$)")
    padded = F.concat(F.lit(" "), col_folded, F.lit(" "))
    return padded.contains(F.lit(" " + sval.norm + " "))


def _value_col(v, field_prefix: str):
    from pyspark.sql import functions as F

    if isinstance(v, NumberValue):
        return F.lit(v.n)
    if isinstance(v, StringValue):
        return F.lit(v.norm)
    if isinstance(v, FieldValue):
        if "." in v.name:
            base, attr = v.name.split(".", 1)
            col = F.col(field_prefix + base)
            if attr == "year":
                return F.year(col)
            if attr == "month":
                return F.month(col)
            if attr == "day":
                return F.dayofmonth(col)
            return col[attr]
        return F.col(field_prefix + v.name)
    if isinstance(v, FunCall):
        if v.name == "date":
            args = []
            for a in v.args:
                if isinstance(a, NumberValue):
                    args.append(int(a.n))
                elif isinstance(a, StringValue):
                    args.append(_month_number(a.s))
                else:
                    raise ValueError(f"bad date() argument {a!r}")
            y = args[0]
            m = args[1] if len(args) > 1 else 1
            d = args[2] if len(args) > 2 else 1
            return F.to_date(F.lit(f"{y:04d}-{m:02d}-{d:02d}"))
        raise ValueError(f"unknown metadata function {v.name!r}")
    raise TypeError(f"unknown value {v!r}")


def _compile(e, field_prefix: str):
    from pyspark.sql import functions as F

    if isinstance(e, OrExpr):
        col = _compile(e.clauses[0], field_prefix)
        for c in e.clauses[1:]:
            col = col | _compile(c, field_prefix)
        return col
    if isinstance(e, AndExpr):
        col = _compile(e.clauses[0], field_prefix)
        for c in e.clauses[1:]:
            col = col & _compile(c, field_prefix)
        return col
    if isinstance(e, NotExpr):
        from pyspark.sql import functions as F

        # negation is "does NOT match the positive filter" (Lucene MUST_NOT):
        # a document missing the field must satisfy the negation, but Spark's
        # three-valued ~NULL is NULL and would drop it — coalesce first
        return ~F.coalesce(_compile(e.expr, field_prefix), F.lit(False))
    if isinstance(e, Cmp):
        # string comparisons are aggressively normalized on BOTH sides: the
        # reference normalizes metadata strings at index AND query time
        # (metadata/Ast.scala:22-25, OdinsonIndexWriter.scala:243). The query
        # literal side used .norm (Python); the column side gets the
        # Catalyst-expression equivalent (lower + diacritic fold) so e.g.
        # character == 'mr darcy' matches a stored 'Mr Darçy'. Equality also
        # supports the reference's /regex/ token parts.
        if e.op == "==" and isinstance(e.rhs, StringValue) and not isinstance(e.lhs, StringValue):
            return _string_eq(fold_string_column(_value_col(e.lhs, field_prefix)), e.rhs)
        if e.op == "==" and isinstance(e.lhs, StringValue) and not isinstance(e.rhs, StringValue):
            return _string_eq(fold_string_column(_value_col(e.rhs, field_prefix)), e.lhs)
        lhs = _value_col(e.lhs, field_prefix)
        rhs = _value_col(e.rhs, field_prefix)
        if isinstance(e.rhs, StringValue) and not isinstance(e.lhs, StringValue):
            lhs = fold_string_column(lhs)
        if isinstance(e.lhs, StringValue) and not isinstance(e.rhs, StringValue):
            rhs = fold_string_column(rhs)
        # true open/closed ranges (the reference approximates </> as ±1 on
        # doubles, MetadataCompiler.scala:64-114 — a quirk we fix)
        if e.op == "<":
            return lhs < rhs
        if e.op == "<=":
            return lhs <= rhs
        if e.op == ">":
            return lhs > rhs
        if e.op == ">=":
            return lhs >= rhs
        if e.op == "==":
            return lhs == rhs
        raise ValueError(e.op)
    if isinstance(e, Nested):
        from pyspark.sql import functions as F

        # nested metadata: exists(array<struct>, s -> predicate(s.*)) —
        # replaces the reference's Lucene parent/child block join
        def pred(s):
            return _compile_nested(e.expr, s)

        return F.exists(F.col(field_prefix + e.name), pred)
    if isinstance(e, Contains):
        col = fold_string_column(_value_col(e.field, field_prefix))
        return _string_contains(col, e.value)
    raise TypeError(f"unknown expression {e!r}")


def _compile_nested(e, s):
    from pyspark.sql import functions as F

    if isinstance(e, OrExpr):
        col = _compile_nested(e.clauses[0], s)
        for c in e.clauses[1:]:
            col = col | _compile_nested(c, s)
        return col
    if isinstance(e, AndExpr):
        col = _compile_nested(e.clauses[0], s)
        for c in e.clauses[1:]:
            col = col & _compile_nested(c, s)
        return col
    if isinstance(e, NotExpr):
        return ~F.coalesce(_compile_nested(e.expr, s), F.lit(False))
    if isinstance(e, Cmp):
        if e.op == "==" and isinstance(e.rhs, StringValue) and isinstance(e.lhs, FieldValue):
            return _string_eq(fold_string_column(s[e.lhs.name]), e.rhs)
        if e.op == "==" and isinstance(e.lhs, StringValue) and isinstance(e.rhs, FieldValue):
            return _string_eq(fold_string_column(s[e.rhs.name]), e.lhs)

        def val(v, other):
            if isinstance(v, FieldValue):
                col = s[v.name]
                return fold_string_column(col) if isinstance(other, StringValue) else col
            return _value_col(v, "")

        lhs, rhs = val(e.lhs, e.rhs), val(e.rhs, e.lhs)
        return {
            "<": lhs < rhs,
            "<=": lhs <= rhs,
            ">": lhs > rhs,
            ">=": lhs >= rhs,
            "==": lhs == rhs,
        }[e.op]
    if isinstance(e, Contains):
        return _string_contains(fold_string_column(s[e.field.name]), e.value)
    raise TypeError(f"unsupported nested expression {e!r}")
