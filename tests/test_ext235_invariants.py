"""Definition-level invariants for ext235 (polynomial-kernel MMD):
the moment factorization must equal the literal double-sum kernel
MMD, the statistic must separate planted distribution shifts and
vanish on identical samples, and batch must equal the replay."""

from __future__ import annotations

import random
from fractions import Fraction

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

_Q = {q.name: q.fn for q in registry()}
_C = 10**6  # the kernel scale implied by the e6 quantization


def _mmd2_pairs(xs, ys, c):
    """Literal V-statistic MMD^2 with k(u,v) = (1 + uv/c)^3, exact
    rationals -- the definition the factorization must reproduce."""
    k = lambda u, v: (1 + Fraction(u * v, c)) ** 3
    n, m = len(xs), len(ys)
    kxx = sum(k(a, b) for a in xs for b in xs) / n**2
    kyy = sum(k(a, b) for a in ys for b in ys) / m**2
    kxy = sum(k(a, b) for a in xs for b in ys) / (n * m)
    return kxx + kyy - 2 * kxy


def _mmd2_moments(xs, ys, c):
    """The factorized form the engines compute (exact rationals,
    before quantization)."""
    mu = lambda s, p: Fraction(sum(v**p for v in s), len(s))
    d1 = mu(xs, 1) - mu(ys, 1)
    d2 = mu(xs, 2) - mu(ys, 2)
    d3 = mu(xs, 3) - mu(ys, 3)
    return (
        3 * d1**2 / c + 3 * d2**2 / Fraction(c) ** 2 + d3**2 / Fraction(c) ** 3
    )


def test_factorization_equals_double_sum():
    rng = random.Random(17)
    for _ in range(25):
        xs = [rng.randint(0, 500) for _ in range(rng.randint(2, 12))]
        ys = [rng.randint(0, 500) for _ in range(rng.randint(2, 12))]
        assert _mmd2_pairs(xs, ys, _C) == _mmd2_moments(xs, ys, _C)


def test_mmd_zero_iff_same_sample():
    xs = [3, 7, 7, 100, 42]
    assert _mmd2_moments(xs, list(xs), _C) == 0
    assert _mmd2_moments(xs, [v + 10 for v in xs], _C) > 0


def test_mmd_separates_planted_shift():
    """A mean shift and a pure variance shift both register (the
    degree-3 kernel sees moments 1..3 -- a location-only statistic
    would miss the second)."""
    rng = random.Random(19)
    base = [rng.randint(40, 60) for _ in range(500)]
    shifted = [v + 30 for v in base]
    spread = [50 + (v - 50) * 3 for v in base]
    d_shift = _mmd2_moments(base, shifted, _C)
    d_spread = _mmd2_moments(base, spread, _C)
    d_null = _mmd2_moments(base, list(reversed(base)), _C)
    assert d_null == 0
    assert d_shift > 0 and d_spread > 0


def test_batch_equals_replay(spark):
    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in _Q["mmd_poly_drift"](spark, sf).collect()}
    replay = {tuple(r) for r in _Q["streaming_mmd_replay"](spark, sf).collect()}
    assert batch == replay and len(batch) == 1
