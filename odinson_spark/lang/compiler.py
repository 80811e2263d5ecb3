"""AST → executable program.

Applies the same compile-time rewrites the reference performs
(/root/reference/core/src/main/scala/ai/lum/odinson/compiler/QueryCompiler.scala:140-343):

* quantifier normalization (``x{1,1}``→x, ``x{0,0}``→ε, ``x{0,n}``→
  optional(x{1,n}), wildcard-repetition algebra ``[]{n}``→AllNGrams(n),
  ``[]{m,n}``→ OR of fixed lengths ordered by greediness),
* consecutive-wildcard fusion and nested-concat flattening,
* constant-fail propagation (``![]`` → fail),
* boolean-constraint compilation to batch-vectorized mask expressions.

The output is a tree of :mod:`odinson_spark.match.program` nodes plus a
*prefilter* (see :mod:`odinson_spark.plans.prefilter`) that Catalyst can push
into the scan.
"""

from __future__ import annotations

from typing import Dict, Optional

from ..match import program as prog
from . import ast
from .parser import QueryParser


class PatternCompiler:
    def __init__(self, parser: Optional[QueryParser] = None):
        self.parser = parser or QueryParser()
        self._constraint_memo: Dict[object, prog.MaskExpr] = {}

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def compile(self, pattern: str) -> prog.Prog:
        tree = self.parser.parse_query(pattern)
        if isinstance(tree, ast.EventPattern):
            return self.compile_event(tree)
        p = self.compile_pattern(tree)
        return p if p is not None else prog.PFail()

    # ------------------------------------------------------------------
    # constraints → mask expressions
    # ------------------------------------------------------------------

    def compile_constraint(self, c) -> prog.MaskExpr:
        memo = self._constraint_memo.get(c)
        if memo is not None:
            return memo
        out = self._compile_constraint(c)
        self._constraint_memo[c] = out
        return out

    def _compile_constraint(self, c) -> prog.MaskExpr:
        t = type(c)
        if t is ast.Wildcard:
            return prog.TrueMask()
        if t is ast.FieldConstraint:
            return prog.LeafMask(c.name, c.matcher)
        if t is ast.FuzzyConstraint:
            return prog.LeafMask(c.name, c.matcher, fuzzy=True)
        if t is ast.NegatedConstraint:
            inner = c.constraint
            if type(inner) is ast.NegatedConstraint:
                return self.compile_constraint(inner.constraint)
            if type(inner) is ast.Wildcard:
                return prog.FalseMask()
            return prog.NotMask(self.compile_constraint(inner))
        if t is ast.ConjunctiveConstraint:
            return prog.AndMask(tuple(self.compile_constraint(x) for x in c.constraints))
        if t is ast.DisjunctiveConstraint:
            return prog.OrMask(tuple(self.compile_constraint(x) for x in c.constraints))
        raise TypeError(f"unknown constraint {c!r}")

    # ------------------------------------------------------------------
    # surface patterns → programs (None = compiles to nothing)
    # ------------------------------------------------------------------

    def compile_pattern(self, p) -> Optional[prog.Prog]:
        t = type(p)

        if t is ast.ConstraintPattern:
            if type(p.constraint) is ast.Wildcard:
                return prog.PAllNGrams(1)
            expr = self.compile_constraint(p.constraint)
            if isinstance(expr, prog.TrueMask):
                return prog.PAllNGrams(1)
            if isinstance(expr, prog.FalseMask):
                return prog.PFail()
            return prog.PToken(expr)

        if t is ast.AssertionPattern:
            return self._compile_assertion(p.assertion)

        if t is ast.DisjunctivePattern:
            # structural dedup of identical clauses (reference .distinct on
            # compiled query trees; we dedup on the source AST, same effect)
            seen_src = set()
            clauses = []
            for x in p.patterns:
                if x in seen_src:
                    continue
                seen_src.add(x)
                c = self.compile_pattern(x)
                if c is not None:
                    clauses.append(c)
            if not clauses:
                return None
            if len(clauses) == 1:
                return clauses[0]
            return prog.POr(clauses)

        if t is ast.ConcatenatedPattern:
            clauses = [self.compile_pattern(x) for x in p.patterns]
            clauses = [c for c in clauses if c is not None]
            if not clauses:
                return None
            # flatten nested concats + fuse consecutive wildcard n-grams
            flat = []
            for c in clauses:
                if isinstance(c, prog.PConcat):
                    flat.extend(c.clauses)
                else:
                    flat.append(c)
            fused = []
            for c in flat:
                if (
                    fused
                    and isinstance(c, prog.PAllNGrams)
                    and isinstance(fused[-1], prog.PAllNGrams)
                ):
                    fused[-1] = prog.PAllNGrams(fused[-1].n + c.n)
                else:
                    fused.append(c)
            if len(fused) == 1:
                return fused[0]
            return prog.PConcat(fused)

        if t is ast.NamedCapturePattern:
            sub = self.compile_pattern(p.pattern)
            if sub is None:
                return None
            return prog.PNamedCapture(sub, p.name, p.label)

        if t is ast.MentionPattern:
            return prog.PMention(p.label)

        if t is ast.ExpandPattern:
            sub = self.compile_pattern(p.pattern)
            if sub is None:
                return None
            return prog.PExpand(sub)

        if t is ast.FilterPattern:
            main = self.compile_pattern(p.main)
            filt = self.compile_pattern(p.filter)
            if main is None or filt is None:
                return None
            return prog.PFilter(main, filt)

        if t is ast.GraphTraversalPattern:
            src = self.compile_pattern(p.src)
            if src is None:
                return None
            ft = self.compile_full_traversal(p.full_traversal)
            return prog.PGraphTraversal(src, ft)

        if t is ast.GreedyRepetitionPattern:
            return self._compile_repetition(p.pattern, p.min, p.max, greedy=True)
        if t is ast.LazyRepetitionPattern:
            return self._compile_repetition(p.pattern, p.min, p.max, greedy=False)

        if t is ast.EventPattern:
            return self.compile_event(p)

        raise TypeError(f"unknown pattern {p!r}")

    def _compile_assertion(self, a) -> prog.Prog:
        t = type(a)
        if t is ast.SentenceStartAssertion:
            return prog.PSentenceStart()
        if t is ast.SentenceEndAssertion:
            return prog.PSentenceEnd()
        if t is ast.PositiveLookaheadAssertion:
            return prog.PLookahead(self.compile_pattern(a.pattern) or prog.PFail(), True)
        if t is ast.NegativeLookaheadAssertion:
            return prog.PLookahead(self.compile_pattern(a.pattern) or prog.PFail(), False)
        if t is ast.PositiveLookbehindAssertion:
            return prog.PLookbehind(self.compile_pattern(a.pattern) or prog.PFail(), True)
        if t is ast.NegativeLookbehindAssertion:
            return prog.PLookbehind(self.compile_pattern(a.pattern) or prog.PFail(), False)
        raise TypeError(f"unknown assertion {a!r}")

    def _compile_repetition(self, pattern, mn: int, mx: Optional[int], greedy: bool):
        # parity: QueryCompiler.scala:238-343
        if (mn, mx) == (0, 0):
            return prog.PAllNGrams(0)
        sub = self.compile_pattern(pattern)
        if sub is None:
            return None
        is_zero_ngram = isinstance(sub, prog.PAllNGrams) and sub.n == 0
        if is_zero_ngram:
            return sub
        if (mn, mx) == (1, 1):
            return sub
        if (mn, mx) == (0, 1):
            return prog.POptional(sub, greedy)
        if mn == 0 and mx is None:
            return prog.POptional(prog.PRepeat(sub, 1, None, greedy), greedy)
        if mx is None:
            return prog.PRepeat(sub, mn, None, greedy)
        if mn == mx:
            if isinstance(sub, prog.PAllNGrams):
                return prog.PAllNGrams(sub.n * mn)
            return prog.PRepeat(sub, mn, mx, greedy)
        # mn < mx, mx finite
        if isinstance(sub, prog.PAllNGrams):
            rng = range(mx, mn - 1, -1) if greedy else range(mn, mx + 1)
            return prog.POr([prog.PAllNGrams(i * sub.n) for i in rng])
        if mn == 0:
            return prog.POptional(prog.PRepeat(sub, 1, mx, greedy), greedy)
        return prog.PRepeat(sub, mn, mx, greedy)

    # ------------------------------------------------------------------
    # graph traversals
    # ------------------------------------------------------------------

    def compile_full_traversal(self, ft) -> prog.FullTraversalProg:
        t = type(ft)
        if t is ast.SingleStepFullTraversalPattern:
            surface = self.compile_pattern(ft.surface) or prog.PFail()
            return prog.SingleStepFT(ft.traversal, surface)
        if t is ast.ConcatFullTraversalPattern:
            return prog.ConcatFT([self.compile_full_traversal(c) for c in ft.clauses])
        if t is ast.RepeatFullTraversalPattern:
            return prog.RepeatFT(ft.min, ft.max, self.compile_full_traversal(ft.full_traversal))
        raise TypeError(f"unknown full traversal {ft!r}")

    # ------------------------------------------------------------------
    # events
    # ------------------------------------------------------------------

    def compile_event(self, ev: ast.EventPattern) -> prog.PEvent:
        trigger = self.compile_pattern(ev.trigger)
        if trigger is None:
            trigger = prog.PFail()
        required = []
        optional = []
        for a in ev.arguments:
            ca = prog.CompiledArgument(
                a.name,
                a.label,
                a.min,
                a.max,
                a.promote,
                self.compile_full_traversal(a.full_traversal),
            )
            (required if a.min > 0 else optional).append(ca)
        return prog.PEvent(trigger, required, optional)
