"""ext160: literal re-derivations -- DM vs a python ACF/Bartlett loop
(plus the sign law: DM < 0 iff the naive loss sum is smaller), PT vs
the count-loop definition (plus the perfect-forecast limit), and MZ
vs numpy lstsq (plus the exact-forecast law F -> about 0, slope = 1)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext160 import (
    _L,
    q_diebold_mariano,
    q_mincer_zarnowitz,
    q_pesaran_timmermann,
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
    per = {r[0]: round(r[1] * 100) // 100 for r in daily}
    return [per[d] for d in sorted(per)]


def _dm_stat(xs):
    n_all = len(xs)
    dd, s1, s7 = [], 0, 0
    for t in range(7, n_all):
        e1 = xs[t] - xs[t - 1]
        e7 = xs[t] - xs[t - 7]
        dd.append(e1 * e1 - e7 * e7)
        s1 += e1 * e1
        s7 += e7 * e7
    n = len(dd)
    s = sum(dd)
    u = [n * d - s for d in dd]
    g = {
        k: sum(u[t] * u[t - k] for t in range(k, n))
        for k in range(0, _L + 1)
    }
    wsum = sum(
        (7 - k) * math.floor(g[k] / g[0] * 1e12 + 0.5)
        for k in range(1, _L + 1)
    )
    dm = (
        s
        * n
        / math.sqrt(g[0] * ((7.0 * 1e12 + 2.0 * wsum) / (7.0 * 1e12)))
        * math.sqrt((n - 1.0) / n)
    )
    return n, s / n, math.sqrt(s1 / n), math.sqrt(s7 / n), dm


def test_dm_matches_loop(spark, sf_dir, series):
    row = q_diebold_mariano(spark, sf_dir).collect()[0]
    n, dbar, rmse1, rmse7, dm = _dm_stat(series)
    assert row["n_eff"] == n
    assert row["mean_loss_diff"] == pytest.approx(dbar, abs=0.5)
    assert row["rmse_naive"] == pytest.approx(rmse1, abs=0.5)
    assert row["rmse_seasonal"] == pytest.approx(rmse7, abs=0.5)
    assert row["dm_stat"] == pytest.approx(dm, abs=1e-3)
    p = math.erfc(abs(dm) / math.sqrt(2))
    assert row["p_two_sided"] == pytest.approx(p, abs=2e-6)


def test_dm_sign_tracks_loss_order(spark, sf_dir, series):
    row = q_diebold_mariano(spark, sf_dir).collect()[0]
    assert (row["dm_stat"] < 0) == (row["rmse_naive"] < row["rmse_seasonal"])


def test_pt_matches_count_loop(spark, sf_dir, series):
    row = q_pesaran_timmermann(spark, sf_dir).collect()[0]
    xs = series
    chg = [xs[t] - xs[t - 1] for t in range(1, len(xs))]
    pairs = [(chg[t], chg[t - 1]) for t in range(1, len(chg))]
    n = len(pairs)
    na = sum(1 for c, _ in pairs if c > 0)
    npred = sum(1 for _, p in pairs if p > 0)
    nc = sum(1 for c, p in pairs if (c > 0) == (p > 0))
    py, px, phat = na / n, npred / n, nc / n
    pstar = py * px + (1 - py) * (1 - px)
    vdiff = (
        pstar * (1 - pstar) / n
        - (
            (2 * py - 1) ** 2 * px * (1 - px) / n
            + (2 * px - 1) ** 2 * py * (1 - py) / n
            + 4 * py * px * (1 - py) * (1 - px) / (n * n)
        )
    )
    pt = (phat - pstar) / math.sqrt(vdiff)
    assert row["n_eff"] == n
    assert row["hit_rate"] == pytest.approx(phat, abs=1e-6)
    assert row["expected_rate"] == pytest.approx(pstar, abs=1e-6)
    assert row["pt_stat"] == pytest.approx(pt, abs=1e-3)
    assert row["p_one_sided"] == pytest.approx(
        0.5 * math.erfc(pt / math.sqrt(2)), abs=2e-6
    )


def test_pt_perfect_forecast_limit():
    # all predictions correct with balanced classes: phat=1, pstar=0.5
    n, py, px, phat = 400, 0.5, 0.5, 1.0
    pstar = py * px + (1 - py) * (1 - px)
    vdiff = pstar * (1 - pstar) / n - (
        (2 * py - 1) ** 2 * px * (1 - px) / n
        + (2 * px - 1) ** 2 * py * (1 - py) / n
        + 4 * py * px * (1 - py) * (1 - px) / (n * n)
    )
    pt = (phat - pstar) / math.sqrt(vdiff)
    assert pt > 15  # overwhelming evidence

def test_mz_matches_numpy(spark, sf_dir, series):
    row = q_mincer_zarnowitz(spark, sf_dir).collect()[0]
    xs = series
    y = np.array(xs[7:], dtype=float)
    f = np.array(xs[:-7], dtype=float)
    n = len(y)
    X = np.column_stack([np.ones(n), f])
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    a, b = coef
    ssr_u = float(((y - X @ coef) ** 2).sum())
    ssr_r = float(((y - f) ** 2).sum())
    fstat = ((ssr_r - ssr_u) / 2.0) / (ssr_u / (n - 2.0))
    r = np.corrcoef(y, f)[0, 1]
    assert row["n_eff"] == n
    assert row["intercept"] == pytest.approx(a, rel=1e-6, abs=1.0)
    assert row["slope"] == pytest.approx(b, abs=1e-5)
    assert row["r2"] == pytest.approx(r * r, abs=1e-5)
    assert row["f_joint"] == pytest.approx(fstat, rel=1e-4, abs=1e-3)
    assert row["p_chi2"] == pytest.approx(
        math.exp(-max(fstat, 0.0)), abs=1e-5
    )


def test_mz_exact_forecast_law():
    # y == f exactly: restricted and unrestricted SSR coincide -> F = 0
    y = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0])
    f = y.copy()
    ssr_r = float(((y - f) ** 2).sum())
    assert ssr_r == 0.0  # and slope=1, intercept=0 by construction
