"""Definition-level invariants for ext240 (Sinkhorn OT): marginal
feasibility at convergence, positivity, the independent-coupling
upper bound on cost, and eps -> 0 sharpening toward the monotone
(sorted) plan -- all on planted histograms."""

from __future__ import annotations

import math


def _sinkhorn(a, b, eps, rounds=200):
    n = len(a)
    K = [[math.exp(-abs(i - j) / eps) for j in range(n)] for i in range(n)]
    v = [1.0] * n
    for _ in range(rounds):
        u = [
            0.0 if a[i] == 0.0 else a[i] / sum(K[i][j] * v[j] for j in range(n))
            for i in range(n)
        ]
        v = [
            0.0 if b[j] == 0.0 else b[j] / sum(K[i][j] * u[i] for i in range(n))
            for j in range(n)
        ]
    u = [
        0.0 if a[i] == 0.0 else a[i] / sum(K[i][j] * v[j] for j in range(n))
        for i in range(n)
    ]
    return [[u[i] * K[i][j] * v[j] for j in range(n)] for i in range(n)]


_A = [0.3, 0.1, 0.0, 0.2, 0.1, 0.1, 0.1, 0.1]
_B = [0.1, 0.1, 0.2, 0.1, 0.0, 0.2, 0.2, 0.1]


def test_marginals_and_positivity():
    P = _sinkhorn(_A, _B, eps=1.0)
    n = len(_A)
    for i in range(n):
        assert abs(sum(P[i]) - _A[i]) < 1e-9
        assert all(p >= 0 for p in P[i])
    for j in range(n):
        assert abs(sum(P[i][j] for i in range(n)) - _B[j]) < 1e-9


def _cost(P):
    return sum(
        P[i][j] * abs(i - j) for i in range(len(P)) for j in range(len(P))
    )


def test_cost_below_independent_coupling():
    """The Sinkhorn plan never costs more than the independent
    coupling a x b (which is feasible, and entropic OT optimizes cost
    minus entropy where independence maximizes entropy alone)."""
    P = _sinkhorn(_A, _B, eps=1.0)
    indep = [[ai * bj for bj in _B] for ai in _A]
    assert _cost(P) <= _cost(indep) + 1e-12


def test_eps_to_zero_approaches_monotone_plan():
    """As eps shrinks, the entropic plan's cost approaches the exact
    1-D OT cost (the sorted/monotone coupling, computed by the
    classic CDF formula sum |F_a - F_b|)."""
    exact = 0.0
    ca = cb = 0.0
    for i in range(len(_A)):
        ca += _A[i]
        cb += _B[i]
        exact += abs(ca - cb)
    c_wide = _cost(_sinkhorn(_A, _B, eps=2.0))
    c_mid = _cost(_sinkhorn(_A, _B, eps=0.5))
    c_tight = _cost(_sinkhorn(_A, _B, eps=0.2, rounds=2000))
    # tighter eps => cost closer to (and approaching) the exact OT
    # cost; small residual infeasibility at finite rounds can dip a
    # hair below it, so the lower bound carries that tolerance
    assert c_wide >= c_mid >= c_tight >= exact - 5e-3
    assert abs(c_tight - exact) < 0.05


def test_identical_marginals_concentrate_on_diagonal():
    P = _sinkhorn(_A, _A, eps=0.1)
    diag = sum(P[i][i] for i in range(len(_A)))
    assert diag > 0.95
