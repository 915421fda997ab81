"""Definition-level invariants for ext254: SSA's eigen/reconstruction
laws and EM's monotone-likelihood / recovery properties."""

from __future__ import annotations

import math
import random

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext254 import (
    _EM_INIT,
    _L,
    fs_em_fold,
    ssa_power_iteration,
    ssa_taps_e9,
)


def _rand_psd(rng, scale=1000):
    """Random integer PSD 7x7 as X X^T of an integer matrix."""
    x = [[rng.randint(-scale, scale) for _ in range(10)] for _ in range(_L)]
    return [
        [sum(x[i][t] * x[j][t] for t in range(10)) for j in range(_L)]
        for i in range(_L)
    ]


def test_power_iteration_eigen_laws():
    """Unit norm and lam <= trace always; tight eigen-residual when a
    spectral gap exists (power iteration's rate is (lam2/lam1)^rounds,
    so a gap is planted via a dominant rank-1 component -- exactly the
    trend-dominated regime SSA extracts)."""
    rng = random.Random(254)
    for _ in range(20):
        c = _rand_psd(rng)
        d = [rng.randint(500, 2000) for _ in range(_L)]
        for i in range(_L):
            for j in range(_L):
                c[i][j] += 40 * d[i] * d[j]  # dominant direction
        u, lam, trace = ssa_power_iteration(c)
        assert abs(sum(x * x for x in u) - 1.0) < 1e-9  # unit norm
        assert 0 < lam <= trace + 1e-6  # dominant share of the trace
        # residual ||Cu - lam u|| small relative to lam (convergence)
        res = 0.0
        for i in range(_L):
            cu = sum(float(c[i][j]) * u[j] for j in range(_L))
            res += (cu - lam * u[i]) ** 2
        assert math.sqrt(res) < 1e-4 * lam


def test_constant_series_reproduced_exactly():
    """For a constant series the trajectory matrix is rank 1, u is the
    uniform vector, the 13 taps sum to 1, and the reconstruction
    returns the constant -- the SSA analogue of Henderson's
    pass-polynomials law."""
    cval = 12345
    k = 30
    c = [[k * cval * cval for _ in range(_L)] for _ in range(_L)]
    u, lam, trace = ssa_power_iteration(c)
    for x in u:
        assert abs(x - 1.0 / math.sqrt(7.0)) < 1e-12
    taps = ssa_taps_e9(u)
    total = taps[0] + 2 * sum(taps[1:])
    assert abs(total - 1_000_000_000) <= 13  # sum of taps == 1 at e9
    # convolution of the constant series: num = cval * total
    trend = (cval * taps[0] + sum(2 * cval * t for t in taps[1:]))
    assert abs(trend - cval * 10**9) <= 13 * cval


def _loglik(patterns, p, m, uu):
    ll = 0.0
    for g1, g2, g3, cnt in patterns:
        gs = (g1, g2, g3)
        a = p
        b = 1.0 - p
        for f in range(3):
            a *= m[f] if gs[f] else 1.0 - m[f]
            b *= uu[f] if gs[f] else 1.0 - uu[f]
        ll += cnt * math.log(a + b)
    return ll


def test_em_monotone_likelihood():
    """Each EM round must not decrease the observed-data
    log-likelihood (the EM guarantee), on random pattern tables."""
    rng = random.Random(41)
    for _ in range(20):
        pats = [
            (g1, g2, g3, rng.randint(1, 500))
            for g1 in (0, 1)
            for g2 in (0, 1)
            for g3 in (0, 1)
        ]
        prev = _loglik(
            pats, _EM_INIT["p"], _EM_INIT["m"], _EM_INIT["u"]
        )
        for r in range(1, 6):
            p, m, uu, _ = fs_em_fold(pats, rounds=r)
            cur = _loglik(pats, p, m, uu)
            assert cur >= prev - 1e-6
            prev = cur


def test_em_recovers_planted_separation():
    """Pattern counts generated from a known (p, m, u) model: EM finds
    m_f > u_f for every field and a match rate near truth."""
    true_p, true_m, true_u = 0.25, [0.95, 0.9, 0.85], [0.05, 0.2, 0.3]
    pats = []
    n = 100_000
    for g1 in (0, 1):
        for g2 in (0, 1):
            for g3 in (0, 1):
                gs = (g1, g2, g3)
                pm, pu = true_p, 1 - true_p
                for f in range(3):
                    pm *= true_m[f] if gs[f] else 1 - true_m[f]
                    pu *= true_u[f] if gs[f] else 1 - true_u[f]
                cnt = round(n * (pm + pu))
                if cnt:
                    pats.append((g1, g2, g3, cnt))
    p, m, uu, _ = fs_em_fold(pats, rounds=40)
    assert all(m[f] > uu[f] for f in range(3))
    assert abs(p - true_p) < 0.05
    assert all(abs(m[f] - true_m[f]) < 0.08 for f in range(3))
