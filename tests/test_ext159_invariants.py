"""ext159: literal re-derivations -- DFA vs a numpy segment-OLS loop
(plus the white-noise law alpha ~ 0.5 on an AR(0) fixture), Higuchi
vs the textbook curve-length loop (plus FD ~ 1 for a straight line),
and Bartels RVN vs the rank-loop definition (plus the exact E[RVN]=2
mean law over all permutations of a tiny n)."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext159 import (
    _DFA_C,
    _HIG_C,
    _KMAX,
    _SCALES,
    q_bartels_rank_vn,
    q_dfa_fluctuation,
    q_higuchi_fractal_dim,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def series(spark, sf_dir):
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    return [per[d] for d in sorted(per)]


def _dfa_f2(xs_dollars):
    """Replicate the query's exact-integer DFA pipeline in numpy."""
    n = len(xs_dollars)
    s_tot = sum(xs_dollars)
    cum = np.cumsum(xs_dollars)
    y = cum * n - np.arange(1, n + 1, dtype=object) * s_tot
    out = {}
    for w in _SCALES:
        terms = []
        for g in range(n // w):
            seg = np.array([float(v) for v in y[g * w : (g + 1) * w]])
            u = np.arange(1, w + 1, dtype=float)
            sy, suy, syy = seg.sum(), (u * seg).sum(), (seg * seg).sum()
            su, suu = w * (w + 1) / 2, w * (w + 1) * (2 * w + 1) / 6
            ssres = (syy - sy * sy / w) - (suy - su * sy / w) ** 2 / (
                suu - su * su / w
            )
            terms.append(math.floor(ssres / w / (n * n) * 1e3 + 0.5))
        out[w] = sum(terms) / 1e3 / (n // w)
    return out


def test_dfa_matches_numpy_loop(spark, sf_dir, series):
    row = q_dfa_fluctuation(spark, sf_dir).collect()[0]
    xs = [v // 100 for v in series]
    f2 = _dfa_f2(xs)
    for w in _SCALES:
        assert row[f"f_{w}"] == pytest.approx(math.sqrt(f2[w]), rel=1e-6)
    alpha = 0.5 * sum(c * math.log(f2[w]) for c, w in zip(_DFA_C, _SCALES))
    assert row["alpha"] == pytest.approx(alpha, abs=1e-6)
    assert row["n_days"] == len(xs)


def test_dfa_white_noise_law():
    # alpha ~ 0.5 for iid noise: deterministic LCG fixture, no Date/rand
    rng = []
    x = 123456789
    for _ in range(2048):
        x = (1103515245 * x + 12345) % (2**31)
        rng.append(x % 100000)
    f2 = _dfa_f2(rng)
    alpha = 0.5 * sum(c * math.log(f2[w]) for c, w in zip(_DFA_C, _SCALES))
    assert 0.35 < alpha < 0.65


def test_higuchi_matches_textbook_loop(spark, sf_dir, series):
    row = q_higuchi_fractal_dim(spark, sf_dir).collect()[0]
    xs = [v // 100 for v in series]
    n = len(xs)
    lks = {}
    for k in range(1, _KMAX + 1):
        per_m = []
        for m in range(1, k + 1):
            idx = list(range(m, n + 1, k))  # 1-based sample points
            cnt = len(idx) - 1
            s_abs = sum(
                abs(xs[idx[i] - 1] - xs[idx[i - 1] - 1])
                for i in range(1, len(idx))
            )
            per_m.append(
                math.floor(s_abs * (n - 1) / (cnt * k * k) * 1e6 + 0.5)
            )
        lks[k] = sum(per_m) / 1e6 / k
    for k in range(1, _KMAX + 1):
        assert row[f"l_{k}"] == pytest.approx(lks[k], abs=0.02)
    fd = -sum(
        c * math.log(lks[k]) for c, k in zip(_HIG_C, range(1, _KMAX + 1))
    )
    assert row["higuchi_fd"] == pytest.approx(fd, abs=1e-6)
    assert 1.0 <= row["higuchi_fd"] <= 2.2


def test_higuchi_line_fd_is_one():
    # straight line: L(k) proportional to 1/k... times (N-1)*slope,
    # so ln L on ln k has slope -1 exactly -> FD = 1
    n = 1000
    xs = [7 * t for t in range(n)]
    lks = {}
    for k in range(1, _KMAX + 1):
        per_m = []
        for m in range(1, k + 1):
            idx = list(range(m, n + 1, k))
            cnt = len(idx) - 1
            s_abs = sum(
                abs(xs[idx[i] - 1] - xs[idx[i - 1] - 1])
                for i in range(1, len(idx))
            )
            per_m.append(s_abs * (n - 1) / (cnt * k * k))
        lks[k] = sum(per_m) / k
    fd = -sum(
        c * math.log(lks[k]) for c, k in zip(_HIG_C, range(1, _KMAX + 1))
    )
    assert fd == pytest.approx(1.0, abs=1e-12)


def test_bartels_matches_rank_loop(spark, sf_dir, series):
    row = q_bartels_rank_vn(spark, sf_dir).collect()[0]
    xs = series
    n = len(xs)
    order = sorted(range(n), key=lambda i: (xs[i], i))
    rk = [0] * n
    for pos, i in enumerate(order, 1):
        rk[i] = pos
    nm = sum((rk[t] - rk[t + 1]) ** 2 for t in range(n - 1))
    rvn = 12.0 * nm / (n * (n * n - 1))
    vr = 4 * (n - 2) * (5 * n * n - 2 * n - 9) / (5 * n * (n + 1) * (n - 1) ** 2)
    z = (rvn - 2.0) / math.sqrt(vr)
    assert row["n_days"] == n
    assert row["rvn"] == pytest.approx(rvn, abs=1e-6)
    assert row["z"] == pytest.approx(z, abs=1e-4)
    p = math.erfc(abs(z) / math.sqrt(2.0))
    assert row["p_two_sided"] == pytest.approx(p, abs=2e-6)
    assert row["reject_5pct"] == (abs(z) > 1.959963984540054)


def test_bartels_mean_law_exact():
    # E[NM] over all permutations equals (n^2 - 1) * n / 6, so
    # E[RVN] = 2 exactly
    n = 5
    nms = []
    for perm in itertools.permutations(range(1, n + 1)):
        nms.append(sum((perm[t] - perm[t + 1]) ** 2 for t in range(n - 1)))
    mean_rvn = 12.0 * (sum(nms) / len(nms)) / (n * (n * n - 1))
    assert mean_rvn == pytest.approx(2.0, abs=1e-12)
