"""ext194: the per-user streaming Kalman fold's algebra -- batch-split
invariance (concatenated seeded folds == whole-series fold, exactly,
for every split) and the Riccati fixed-point law the posterior
variance must approach regardless of the data."""

from __future__ import annotations

import itertools
import math

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext194 import _KQ, _KR


def _fold(ys, seed=None):
    """The exact recursion both engines run; seed=None means first
    value seeds (x=y1, p=R)."""
    if seed is None:
        if not ys:
            return None
        x, p, k = ys[0], _KR, 0.0
        rest = ys[1:]
    else:
        x, p, k = seed
        rest = ys
    for y in rest:
        pp = p + _KQ
        k = pp / (pp + _KR)
        x = x + k * (y - x)
        p = (1.0 - k) * pp
    return x, p, k


def test_split_invariance_is_exact():
    ys = [12.5, 90.0, 3.25, 55.5, 55.5, 7.0, 101.25, 44.0, 0.5, 63.125]
    ref = _fold(ys)
    n = len(ys)
    for c1, c2 in itertools.combinations_with_replacement(range(n + 1), 2):
        st = _fold(ys[:c1])
        for seg in (ys[c1:c2], ys[c2:]):
            if not seg:
                continue
            st = _fold(seg, seed=st) if st is not None else _fold(seg)
        assert st == ref, (c1, c2)  # EXACT double equality, no tolerance


def test_riccati_fixed_point_law():
    a_star = (_KQ + math.sqrt(_KQ * _KQ + 4 * _KQ * _KR)) / 2.0
    p_star = (1.0 - a_star / (a_star + _KR)) * a_star
    _, p, _ = _fold([50.0] * 200)
    assert abs(p - p_star) < 1e-9
    # and the gain the state carries is the fixed-point gain
    _, _, k = _fold([50.0] * 200)
    assert abs(k - a_star / (a_star + _KR)) < 1e-9
