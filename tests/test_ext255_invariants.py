"""Definition-level invariants for ext255: the location-quotient
weighted-average identity and the Krugman index's range/extremes."""

from __future__ import annotations

import random
from fractions import Fraction


def _cells(rng, n_nations=5, n_segs=4, allow_zero=False):
    return {
        (n, s): rng.randint(0 if allow_zero else 1, 10_000)
        for n in range(n_nations)
        for s in range(n_segs)
    }


def test_lq_weighted_average_is_one():
    """sum over segments of LQ(n, s) * (segment share of economy) == 1
    for every nation, in exact rationals -- the identity that makes LQ
    a well-normalized specialization measure."""
    rng = random.Random(255)
    for _ in range(30):
        e = _cells(rng)
        nations = {n for n, _ in e}
        segs = {s for _, s in e}
        et = sum(e.values())
        for n in nations:
            en = sum(v for (nn, _), v in e.items() if nn == n)
            total = Fraction(0)
            for s in segs:
                es = sum(v for (_, ss), v in e.items() if ss == s)
                lq = Fraction(e[(n, s)] * et, en * es)
                total += lq * Fraction(es, et)
            assert total == 1


def _krugman_ppm(e, n):
    """The query's fold: per-term exact rational |ad - cb| / (bd)
    ppm-quantized by floor division, then summed."""
    nations = {nn for nn, _ in e}
    segs = {s for _, s in e}
    et = sum(e.values())
    en = sum(v for (nn, _), v in e.items() if nn == n)
    k = 0
    for s in segs:
        es = sum(v for (_, ss), v in e.items() if ss == s)
        a = e[(n, s)] * (et - en) - (es - e[(n, s)]) * en
        k += (1_000_000 * abs(a)) // (en * (et - en))
    return k


def test_krugman_range_and_extremes():
    rng = random.Random(77)
    for _ in range(30):
        e = _cells(rng)
        for n in {nn for nn, _ in e}:
            k = _krugman_ppm(e, n)
            assert 0 <= k <= 2_000_000
    # identical mix everywhere -> K == 0 exactly
    e = {(n, s): 100 * (s + 1) for n in range(4) for s in range(3)}
    for n in range(4):
        assert _krugman_ppm(e, n) == 0
    # disjoint mixes -> K == 2 (up to per-term floor quantization)
    e = {(0, 0): 500, (0, 1): 0, (1, 0): 0, (1, 1): 700}
    assert _krugman_ppm(e, 0) >= 2_000_000 - 2
    assert _krugman_ppm(e, 1) >= 2_000_000 - 2
