"""Definition-level invariants for ext239 (binary segmentation):
planted one- and two-shift series are recovered at the exact split
days, the U_t cross-multiplied form equals the literal mean-deviation
CUSUM, and a flat series emits nothing."""

from __future__ import annotations

from fractions import Fraction

_GATE = 200_000


def _scan(vals, lo, hi):
    """The engines' integer scan over 1-based [lo, hi] (split in
    [lo, hi)), on a full-series prefix sum."""
    ps = {0: 0}
    for i, v in enumerate(vals, 1):
        ps[i] = ps[i - 1] + v
    if hi <= lo:
        return None
    base, tot, ln = ps[lo - 1], ps[hi] - ps[lo - 1], hi - lo + 1
    best = None
    for rn in range(lo, hi):
        ua = abs(ln * (ps[rn] - base) - (rn - lo + 1) * tot)
        if best is None or ua > best[1]:
            best = (rn, ua)
    if best is None or best[1] < _GATE * ln:
        return None
    return best


def _bseg(vals):
    n = len(vals)
    found = []
    top = _scan(vals, 1, n)
    if top:
        found.append((1, top[0]))
        for lo, hi in ((1, top[0]), (top[0] + 1, n)):
            sub = _scan(vals, lo, hi)
            if sub:
                found.append((2, sub[0]))
    return found


def test_u_equals_scaled_mean_deviation_cusum():
    """U_t = len * |sum_{i<=t}(x_i - mean_seg)| exactly (the
    cross-multiplication removes the division)."""
    vals = [3, 14, 15, 92, 65, 35, 89, 79, 32]
    n = len(vals)
    mean = Fraction(sum(vals), n)
    run = Fraction(0)
    ps = 0
    for t in range(1, n):
        ps += vals[t - 1]
        run = ps - t * mean
        ua = abs(n * ps - t * sum(vals))
        assert Fraction(ua) == n * abs(run)


def test_recovers_planted_single_shift():
    vals = [1_000_000] * 12 + [2_000_000] * 12
    found = _bseg(vals)
    assert (1, 12) in found  # argmax |U| at the boundary


def test_recovers_planted_double_shift():
    vals = [1_000_000] * 10 + [3_000_000] * 10 + [1_500_000] * 10
    found = _bseg(vals)
    lvl1 = [rn for lvl, rn in found if lvl == 1]
    lvl2 = [rn for lvl, rn in found if lvl == 2]
    assert lvl1 and lvl1[0] in (10, 20)
    other = 20 if lvl1[0] == 10 else 10
    assert other in lvl2


def test_flat_series_emits_nothing():
    assert _bseg([5_000_000] * 30) == []
    # small jitter below the gate also stays silent
    vals = [5_000_000 + (i % 3) * 10 for i in range(30)]
    assert _bseg(vals) == []
