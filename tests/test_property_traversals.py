"""Property-based graph-traversal oracle: random digraphs × random traversal
patterns, engine results vs an independent brute-force interpreter.

Complements the ported TestTraversals/TestDocumentationGraphtraversals
fixtures the way test_property_regex.py complements the surface-pattern
suites: the test-side interpreter is written independently of the engine
(set-based BFS over explicit edge lists), so any divergence in traversal
semantics — direction, label matching, concatenation, union, optional,
Kleene star — fails loudly on inputs no fixture thought of.

Semantics under test (reference GraphTraversal.scala):
``src >l dst`` follows an outgoing edge labeled l, ``<l`` incoming,
``>>``/``<<`` any label; concatenation composes; ``|`` unions;
``?`` is 0-or-1; ``*`` is reflexive-transitive closure.
"""

import random

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import find_matches
from odinson_spark.testing import sentence_batch_from_docs

LABELS = ["a", "b", "c"]
N_TOKENS = 6


# ---------------------------------------------------------------------------
# independent traversal interpreter (sets over explicit edge lists)
# ---------------------------------------------------------------------------


def step(nodes, edges, direction, label):
    out = set()
    for (s, d, l) in edges:
        if label is not None and l != label:
            continue
        if direction == ">":
            if s in nodes:
                out.add(d)
        else:
            if d in nodes:
                out.add(s)
    return out


def interp(trav, nodes, edges):
    """trav is a nested spec: ('step', dir, label|None) | ('concat', [t…]) |
    ('or', [t…]) | ('opt', t) | ('star', t)."""
    kind = trav[0]
    if kind == "step":
        return step(nodes, edges, trav[1], trav[2])
    if kind == "concat":
        cur = set(nodes)
        for t in trav[1]:
            cur = interp(t, cur, edges)
            if not cur:
                return set()
        return cur
    if kind == "or":
        out = set()
        for t in trav[1]:
            out |= interp(t, nodes, edges)
        return out
    if kind == "opt":
        return set(nodes) | interp(trav[1], nodes, edges)
    if kind == "star":
        seen = set(nodes)
        frontier = set(nodes)
        while frontier:
            nxt = interp(trav[1], frontier, edges) - seen
            seen |= nxt
            frontier = nxt
        return seen
    raise ValueError(trav)


def render(trav) -> str:
    kind = trav[0]
    if kind == "step":
        if trav[2] is None:
            return ">>" if trav[1] == ">" else "<<"
        return f"{trav[1]}{trav[2]}"
    if kind == "concat":
        return " ".join(render(t) for t in trav[1])
    if kind == "or":
        return "(" + " | ".join(render(t) for t in trav[1]) + ")"
    if kind == "opt":
        return f"({render(trav[1])})?"
    if kind == "star":
        return f"({render(trav[1])})*"
    raise ValueError(trav)


def gen_traversal(rng, depth=0):
    choices = ["step", "step", "concat", "or", "opt", "star"]
    kind = rng.choice(choices if depth < 2 else ["step"])
    if kind == "step":
        return ("step", rng.choice("><"), rng.choice(LABELS + [None]))
    if kind == "concat":
        return ("concat", [gen_traversal(rng, depth + 1) for _ in range(rng.randint(2, 3))])
    if kind == "or":
        return ("or", [gen_traversal(rng, depth + 1) for _ in range(2)])
    if kind == "opt":
        return ("opt", gen_traversal(rng, depth + 1))
    return ("star", gen_traversal(rng, depth + 1))


def gen_graph(rng):
    # ≥1 edge: a sentence with NO graph yields no traversal matches at all
    # (reference: missing dependencies field → no binary graph → the
    # traversal query matches nothing, even 0-hop optionals); the property
    # under test is traversal semantics over a present graph
    n_edges = rng.randint(1, 10)
    edges = set()
    while len(edges) < n_edges:
        s = rng.randrange(N_TOKENS)
        d = rng.randrange(N_TOKENS)
        if s != d:
            edges.add((s, d, rng.choice(LABELS)))
    return sorted(edges)


def test_random_traversals_match_brute_force():
    rng = random.Random(20260816)
    compiler = PatternCompiler()
    tokens = [f"t{i}" for i in range(N_TOKENS)]
    checked = 0
    for case in range(300):
        edges = gen_graph(rng)
        trav = gen_traversal(rng)
        src_tok = rng.randrange(N_TOKENS)
        pattern = f"[raw=t{src_tok}] {render(trav)} []"
        batch = sentence_batch_from_docs(
            [{"raw": tokens, "edges": list(edges)}], build_inout=False
        )
        program = compiler.compile(pattern)
        # engine matches land ON the destination token (span length 1)
        got_dsts = {m.start for m in find_matches(program, batch.context(0))}
        want = interp(trav, {src_tok}, edges)
        assert got_dsts == want, (
            f"case {case}: pattern={pattern!r} edges={edges} "
            f"got={sorted(got_dsts)} want={sorted(want)}"
        )
        checked += 1
    assert checked == 300
