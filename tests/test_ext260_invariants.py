"""Definition-level invariants for ext260: the quantized log-factorial
Bayes factor against an exact lgamma computation, BF direction laws,
and empirical-Bayes shrinkage laws."""

from __future__ import annotations

import math
import random


def _lf_e12(n: int) -> int:
    return sum(
        int(math.floor(math.log(k) * 1e12 + 0.5)) for k in range(1, n + 1)
    )


def _ln_bf_e12(s1, f1, s2, f2):
    return (
        (_lf_e12(s1) + _lf_e12(f1) - _lf_e12(s1 + f1 + 1))
        + (_lf_e12(s2) + _lf_e12(f2) - _lf_e12(s2 + f2 + 1))
        - (
            _lf_e12(s1 + s2)
            + _lf_e12(f1 + f2)
            - _lf_e12(s1 + f1 + s2 + f2 + 1)
        )
    )


def _ln_bf_exact(s1, f1, s2, f2):
    """Independent formulation via lgamma (lnB(a,b) with a=s+1, b=f+1
    under Beta(1,1) priors)."""

    def lnb(s, f):
        return (
            math.lgamma(s + 1)
            + math.lgamma(f + 1)
            - math.lgamma(s + f + 2)
        )

    return lnb(s1, f1) + lnb(s2, f2) - lnb(s1 + s2, f1 + f2)


def test_quantized_bf_matches_lgamma():
    """The e12 log-factorial sum agrees with the exact lgamma Bayes
    factor to within the accumulated quantization bound (n terms of
    <= 0.5e-12 each)."""
    rng = random.Random(260)
    for _ in range(40):
        s1, f1 = rng.randint(0, 400), rng.randint(0, 400)
        s2, f2 = rng.randint(0, 400), rng.randint(0, 400)
        q = _ln_bf_e12(s1, f1, s2, f2) / 1e12
        exact = _ln_bf_exact(s1, f1, s2, f2)
        n_terms = 3 * (s1 + f1 + s2 + f2 + 1)
        assert abs(q - exact) <= n_terms * 1e-12 + 1e-9


def test_bf_direction_laws():
    """Identical large samples with very different rates favour H1;
    identical rates favour H0; symmetry under group swap."""
    assert _ln_bf_e12(400, 100, 100, 400) > 0  # clearly different rates
    assert _ln_bf_e12(250, 250, 250, 250) < 0  # identical rates
    assert _ln_bf_e12(300, 120, 80, 310) == _ln_bf_e12(80, 310, 300, 120)


def _shrink(s, n, m, ab_sum):
    return (m * ab_sum + s) / (ab_sum + n)


def test_eb_shrinkage_laws():
    """Posterior means sit strictly between the raw rate and the prior
    mean, and more data means less shrinkage."""
    m, ab = 0.3, 50.0
    for s, n in ((0, 2), (2, 2), (10, 40), (90, 100)):
        raw = s / n
        post = _shrink(s, n, m, ab)
        lo, hi = min(raw, m), max(raw, m)
        assert lo - 1e-12 <= post <= hi + 1e-12
    # same raw rate, more data -> closer to raw
    p_small = _shrink(1, 2, m, ab)
    p_big = _shrink(100, 200, m, ab)
    assert abs(p_big - 0.5) < abs(p_small - 0.5)
