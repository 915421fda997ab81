"""ext120: literal re-derivations -- Hoeffding's D per Hollander-Wolfe
from raw values, Shapiro-Francia against the INDEPENDENT stdlib
NormalDist().inv_cdf (not our Acklam polynomial), Siegel medians from
raw float slopes."""

from __future__ import annotations

import statistics

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext120 import (
    _daily_spark,
    q_hoeffding_d_daily,
    q_shapiro_francia_daily,
    q_siegel_repeated_medians,
)


def _daily(spark, sf_dir):
    rows = _daily_spark(spark, sf_dir).collect()
    return [(r["d"], int(r["x"]), int(r["y"])) for r in rows]


def test_hoeffding_matches_hollander_wolfe(spark, sf_dir):
    got = q_hoeffding_d_daily(spark, sf_dir).collect()[0]
    data = _daily(spark, sf_dir)
    xs = [x for _, x, _ in data]
    ys = [y for _, _, y in data]
    n = len(data)
    assert got["n"] == n
    d1 = d2 = d3 = 0.0
    for i in range(n):
        r = 0.5 + sum(
            1.0 if xs[j] < xs[i] else 0.5 if xs[j] == xs[i] else 0.0
            for j in range(n)
        )
        s = 0.5 + sum(
            1.0 if ys[j] < ys[i] else 0.5 if ys[j] == ys[i] else 0.0
            for j in range(n)
        )
        q = 1.0
        for j in range(n):
            if j == i:
                continue
            if xs[j] < xs[i] and ys[j] < ys[i]:
                q += 1.0
            elif xs[j] == xs[i] and ys[j] == ys[i]:
                q += 0.25
            elif (xs[j] == xs[i] and ys[j] < ys[i]) or (
                xs[j] < xs[i] and ys[j] == ys[i]
            ):
                q += 0.5
        d1 += (q - 1) * (q - 2)
        d2 += (r - 1) * (r - 2) * (s - 1) * (s - 2)
        d3 += (r - 2) * (s - 2) * (q - 1)
    d = (
        30.0
        * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    assert got["hoeffding_d"] == pytest.approx(d, abs=2e-6)
    # order count and revenue are strongly dependent: D must say so
    assert got["hoeffding_d"] > 0.01


def test_shapiro_francia_matches_stdlib_invnorm(spark, sf_dir):
    got = q_shapiro_francia_daily(spark, sf_dir).collect()[0]
    data = _daily(spark, sf_dir)
    ys = np.sort(np.array([y for _, _, y in data], dtype=np.float64))
    n = len(ys)
    assert got["n"] == n
    nd = statistics.NormalDist()
    m = np.array(
        [nd.inv_cdf((i - 0.375) / (n + 0.25)) for i in range(1, n + 1)]
    )
    w = np.corrcoef(ys, m)[0, 1] ** 2
    # tolerance covers the e8 score grid + Acklam's 1.15e-9 rel error
    assert got["w_prime"] == pytest.approx(w, abs=5e-6)
    assert 0.0 < got["w_prime"] <= 1.0


def test_siegel_matches_raw_float_medians(spark, sf_dir):
    got = q_siegel_repeated_medians(spark, sf_dir).collect()[0]
    data = _daily(spark, sf_dir)
    d0 = min(d for d, _, _ in data)
    pts = sorted(((d - d0).days, y) for d, _, y in data)
    n = len(pts)
    assert got["n_days"] == n
    med_i = []
    for i in range(n):
        ti, yi = pts[i]
        med_i.append(
            statistics.median(
                (yj - yi) / (tj - ti) for tj, yj in pts if tj != ti
            )
        )
    beta = statistics.median(med_i)
    alpha = statistics.median(y - beta * t for t, y in pts)
    assert got["slope_dollars_per_day"] == pytest.approx(
        beta / 100.0, abs=1e-4
    )
    assert got["intercept_dollars"] == pytest.approx(alpha / 100.0, rel=1e-6, abs=1e-2)
