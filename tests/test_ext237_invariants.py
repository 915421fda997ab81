"""Definition-level invariants for ext237 (SimRank): the textbook
laws on planted graphs -- symmetry, diagonal, the c-bound, the
two-star closed form, and convergence monotonicity of the e9 fold."""

from __future__ import annotations

_E9 = 1_000_000_000


def _simrank(edges, iters=6, e9=_E9):
    nodes = sorted({v for e in edges for v in e})
    inn = {v: [] for v in nodes}
    for a, b in edges:
        inn[b].append(a)
    s = {(a, b): (e9 if a == b else 0) for a in nodes for b in nodes}
    for _ in range(iters):
        nxt = {}
        for a in nodes:
            for b in nodes:
                if a == b:
                    nxt[(a, b)] = e9
                elif inn[a] and inn[b]:
                    tot = sum(s[(i, j)] for i in inn[a] for j in inn[b])
                    nxt[(a, b)] = (4 * tot) // (5 * len(inn[a]) * len(inn[b]))
                else:
                    nxt[(a, b)] = 0
        s = nxt
    return s, nodes


def test_symmetry_and_diagonal():
    edges = [(1, 3), (2, 3), (1, 4), (2, 4), (3, 5), (4, 5)]
    s, nodes = _simrank(edges)
    for a in nodes:
        assert s[(a, a)] == _E9
        for b in nodes:
            assert s[(a, b)] == s[(b, a)]
            assert 0 <= s[(a, b)] <= _E9


def test_two_star_closed_form():
    """Two sinks fed by the same single source: s = c exactly after
    one iteration (s(src,src)=1, |I|=1 each) -- 0.8e9 in the fold."""
    s, _ = _simrank([(0, 1), (0, 2)], iters=1)
    assert s[(1, 2)] == 4 * _E9 // 5
    # further iterations keep it fixed (src has no in-edges)
    s6, _ = _simrank([(0, 1), (0, 2)], iters=6)
    assert s6[(1, 2)] == 4 * _E9 // 5


def test_disjoint_in_neighborhoods_score_lower():
    """Shared payers => higher similarity than disjoint payers."""
    shared = _simrank([(0, 2), (0, 3), (1, 2), (1, 3)])[0][(2, 3)]
    disjoint = _simrank([(0, 2), (1, 3), (4, 2), (5, 3)])[0][(2, 3)]
    assert shared > disjoint


def test_no_in_edges_means_zero():
    s, _ = _simrank([(1, 2), (3, 2)])
    assert s[(1, 3)] == 0  # 1 and 3 are sources: empty in-neighborhoods


def test_iteration_monotone_from_zero():
    """From s0 = I the off-diagonal sequence is nondecreasing (the
    standard SimRank fixpoint monotonicity), so 6 rounds is a lower
    bound of the fixpoint, never an overshoot."""
    edges = [(1, 3), (2, 3), (1, 4), (2, 4), (3, 5), (4, 5), (5, 1)]
    prev = None
    for it in range(1, 7):
        s, nodes = _simrank(edges, iters=it)
        if prev is not None:
            for a in nodes:
                for b in nodes:
                    assert s[(a, b)] >= prev[(a, b)] - 1  # -1: trunc jitter
        prev = s
