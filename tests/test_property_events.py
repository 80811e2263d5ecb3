"""Property-based event oracle: random digraph sentences × random event
grammars (trigger, 1–3 args, quantifiers, promotion), engine results vs an
independent quadratic interpreter.

Complements test_property_regex.py (surface patterns vs Python ``re``) and
test_property_traversals.py (traversals vs set-based BFS) with the third
pillar: event semantics. The interpreter below is written straight from the
reference's spec — trigger matching + required-argument intersection fold
(OdinsonEventQuery.scala:289-345) and argument packaging with min/max
combinations + cartesian product across args (MatchSelector.scala:131-198)
+ the trigger-overlap filter (OdinsonMatch.scala:72-83) — with no code
shared with the engine's PEvent/package_events path.

Scope: single-token argument surfaces (`[]` / `[raw=tM]`), so packaging's
overlap buckets are trivial and the oracle stays an honest independent
derivation; multi-token-argument packaging rides on the ported
TestArgQuantifiers/TestEventTriggers fixtures.
"""

import random
from itertools import combinations, product

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import filter_trigger_overlaps, find_matches
from odinson_spark.match.matches import EventMatch
from odinson_spark.testing import sentence_batch_from_docs

from test_property_traversals import LABELS, N_TOKENS, gen_graph, gen_traversal, interp, render

QUANTS = {
    "": (1, 1),
    "?": (0, 1),
    "+": (1, None),
    "*": (0, None),
    "{2}": (2, 2),
    "{1,2}": (1, 2),
}


# ---------------------------------------------------------------------------
# independent event interpreter
# ---------------------------------------------------------------------------


def arg_packages(dsts, mn, mx):
    """MatchSelector.scala:150-166 — packages for ONE argument given its
    distinct single-token match positions."""
    ms = sorted(dsts)
    if mx is not None and mn == mx:
        return [list(c) for c in combinations(ms, mn)]
    if mx is not None:
        if len(ms) < mn:
            return []
        if len(ms) > mx:
            return [list(c) for c in combinations(ms, mx)]
        return [ms]
    return [] if len(ms) < mn else [ms]


def interpret_event(k, args, edges):
    """Expected events as a sorted list of (trigger_start, ((name, dst), …))
    with the trigger-overlap filter applied."""
    dsts = {}
    for (name, mn, mx, trav, surface) in args:
        d = interp(trav, {k}, edges)
        if surface is not None:
            d &= {surface}
        dsts[name] = d
    required = [a for a in args if a[1] > 0]
    optional = [a for a in args if a[1] == 0]
    # intersection fold: the sketch survives only if every required arg has
    # at least one raw match from this trigger
    if any(not dsts[a[0]] for a in required):
        return []
    per_arg = []
    for (name, mn, mx, _t, _s) in required + optional:
        per_arg.append([(name, pkg) for pkg in arg_packages(dsts[name], mn, mx)])
    events = []
    for combo in product(*per_arg):
        caps = [(name, d) for name, pkg in combo for d in pkg]
        # trigger-overlap filter: drop captures on the trigger token; if any
        # were dropped, re-check every arg's min count
        kept = [(name, d) for name, d in caps if d != k]
        if len(kept) < len(caps):
            counts = {}
            for name, _d in kept:
                counts[name] = counts.get(name, 0) + 1
            if any(counts.get(a[0], 0) < a[1] for a in args):
                continue
        events.append((k, tuple(sorted(kept))))
    return sorted(events)


# ---------------------------------------------------------------------------
# the property
# ---------------------------------------------------------------------------


def gen_args(rng):
    args = []
    for i in range(rng.randint(1, 3)):
        quant = rng.choice(list(QUANTS))
        mn, mx = QUANTS[quant]
        trav = gen_traversal(rng, depth=1)
        surface = rng.choice([None, None, rng.randrange(N_TOKENS)])
        promote = rng.random() < 0.3
        args.append((f"a{i}", mn, mx, trav, surface, quant, promote))
    return args


def render_pattern(k, args):
    lines = [f"trigger = [raw=t{k}]"]
    for (name, _mn, _mx, trav, surface, quant, promote) in args:
        label = f": ^L{name}" if promote else ""
        surf = f"[raw=t{surface}]" if surface is not None else "[]"
        lines.append(f"{name}{label}{quant} = {render(trav)} {surf}")
    return "\n".join(lines) + "\n"


def test_random_events_match_brute_force():
    rng = random.Random(20260817)
    compiler = PatternCompiler()
    tokens = [f"t{i}" for i in range(N_TOKENS)]
    checked = 0
    for case in range(300):
        edges = gen_graph(rng)
        # bias the trigger onto a node with out-edges so required-arg
        # traversals actually fire (pure-random triggers leave ~73% of
        # cases with zero events — still checked, but low-signal)
        if rng.random() < 0.7:
            k = rng.choice(sorted({s for (s, _d, _l) in edges}))
        else:
            k = rng.randrange(N_TOKENS)
        args7 = gen_args(rng)
        args = [(n, mn, mx, t, s) for (n, mn, mx, t, s, _q, _p) in args7]
        pattern = render_pattern(k, args7)
        program = compiler.compile(pattern)
        batch = sentence_batch_from_docs(
            [{"raw": tokens, "edges": list(edges)}], build_inout=False
        )
        got_events = [
            m
            for m in filter_trigger_overlaps(
                find_matches(program, batch.context(0), disable_match_selector=True)
            )
            if isinstance(m, EventMatch)
        ]
        got = sorted(
            (
                m.trigger.start,
                tuple(sorted((c.name, c.match.start) for c in m.captures)),
            )
            for m in got_events
        )
        want = interpret_event(k, args, edges)
        assert got == want, (
            f"case {case}: pattern=\n{pattern}edges={edges}\n"
            f"got={got}\nwant={want}"
        )
        # promoted args carry their label on the capture
        for m in got_events:
            for c in m.captures:
                promoted = {a[0] for a in args7 if a[6]}
                if c.name in promoted:
                    assert c.label == f"L{c.name}"
        checked += 1
    assert checked == 300
