"""Definition-level invariants for ext257: GARCH grid-fit recovery on
planted volatility clustering, and transfer entropy's nonnegativity /
planted-causality laws."""

from __future__ import annotations

import math

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext257 import (
    _GRID,
    garch_fold,
)


def _sinhash(t: float) -> float:
    """Deterministic uniform(0,1) noise (the build-notes sin-hash --
    modular ramps are serially correlated, this is not)."""
    x = math.sin(t * 12.9898 + 78.233) * 43758.5453
    return x - math.floor(x)


def _normal(t: float) -> float:
    """Box-Muller on two sin-hash uniforms."""
    u1 = min(max(_sinhash(t), 1e-9), 1 - 1e-9)
    u2 = _sinhash(t + 0.5)
    return math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.pi * u2)


def _simulate_garch(n, a, b, omega=1e-4):
    s = omega / (1.0 - a - b)
    eps = []
    for t in range(n):
        z = _normal(float(t))
        e = math.sqrt(s) * z
        eps.append(e)
        s = omega + a * e * e + b * s
    return eps


def test_garch_recovers_planted_persistence():
    """Series simulated from a persistent GARCH(1,1) (a=0.15, b=0.8):
    the grid fit lands on a high-persistence cell and beats the
    lowest-persistence cell by a wide likelihood margin; iid noise
    fits no better at high persistence than the truth cell fits the
    clustered series."""
    eps = _simulate_garch(3000, 0.15, 0.8)
    best, negll, varhat = garch_fold(eps)
    a, b = _GRID[best]
    assert a + b >= 0.9 - 1e-9  # found the clustering (0.2+0.7 floats)
    lo = _GRID.index((0.05, 0.6))
    assert negll[best] < negll[lo] - 10.0


def test_garch_fold_identities():
    """Variance targeting: varhat equals the e12-quantized mean square;
    with a truly constant-variance series every cell's sigma^2 path
    stays near varhat, so LLs differ only marginally."""
    eps = [0.01 if t % 2 == 0 else -0.01 for t in range(500)]
    best, negll, varhat = garch_fold(eps)
    assert abs(varhat - 1e-4) < 1e-12
    assert max(negll) - min(negll) < 1.0


def _te(xs, ys):
    """Reference transfer entropy TE(X->Y) mirroring the query's
    quantized-cell formulation."""
    from collections import Counter

    trip = Counter(
        (ys[t + 1], ys[t], xs[t]) for t in range(len(xs) - 1)
    )
    n = sum(trip.values())
    c_yx = Counter()
    c_nyy = Counter()
    c_y = Counter()
    for (yn, y, x), c in trip.items():
        c_yx[(y, x)] += c
        c_nyy[(yn, y)] += c
        c_y[y] += c
    te = 0
    for (yn, y, x), c in trip.items():
        te += math.floor(
            c / n * math.log((c * c_y[y]) / (c_yx[(y, x)] * c_nyy[(yn, y)]))
            * 1e9
            + 0.5
        )
    return te / 1e9


def test_te_planted_causality():
    """y copies x with one step of lag: TE(X->Y) is near ln 2 (one full
    bit of flow) and TE(Y->X) is near zero; both stay >= the tiny
    quantization floor."""
    xs = [1 if _sinhash(float(t)) > 0.5 else 0 for t in range(4000)]
    ys = [0] + xs[:-1]
    fwd = _te(xs, ys)
    bwd = _te(ys, xs)
    assert fwd > 0.6  # ~ln 2 = 0.693
    assert bwd < 0.01
    assert fwd > bwd + 0.5


def test_te_nonnegative_on_independent_series():
    xs = [1 if _sinhash(float(t)) > 0.5 else 0 for t in range(3000)]
    ys = [1 if _sinhash(float(t) + 1000.25) > 0.5 else 0 for t in range(3000)]
    assert _te(xs, ys) >= -1e-6
    assert _te(ys, xs) >= -1e-6
    assert _te(xs, ys) < 0.01
