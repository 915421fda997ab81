"""ext154: literal re-derivations -- ASO epsilon from sorted-sample
quantiles, McLeod-Li from squared-deviation ACF loops, Kupiec LR from
the binomial likelihood (plus its calibration law: LR = 0 when the
observed rate equals p exactly)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext154 import (
    _K_GRID,
    q_almost_stochastic_order,
    q_kupiec_var_backtest,
    q_mcleod_li_arch,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def daily(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    return {r[0]: round(r[1] * 100) // 100 for r in rows}


def test_aso_matches_literal(spark, sf_dir, daily):
    row = q_almost_stochastic_order(spark, sf_dir).collect()[0]
    wd = sorted(v for d, v in daily.items() if d.weekday() < 5)
    we = sorted(v for d, v in daily.items() if d.weekday() >= 5)

    def quant(xs, k):
        # min v with 2K*rank >= (2k-1)*n  (rank 1-based)
        n = len(xs)
        for i, v in enumerate(xs, 1):
            if 2 * _K_GRID * i >= (2 * k - 1) * n:
                return v
        return xs[-1]

    viol = tot = 0
    for k in range(1, _K_GRID + 1):
        gap = quant(wd, k) - quant(we, k)
        tot += gap * gap
        if gap < 0:
            viol += gap * gap
    eps = 0.5 if tot == 0 else viol / tot
    assert row["n_quantiles"] == _K_GRID
    assert row["eps_w2_violation"] == pytest.approx(eps, abs=1e-6)
    assert row["weekday_almost_dominates"] == (eps < 0.5)


def test_mcleod_li_matches_literal(spark, sf_dir, daily):
    got = {r["lag_k"]: r for r in q_mcleod_li_arch(spark, sf_dir).collect()}
    xs = [daily[d] for d in sorted(daily)]
    n = len(xs)
    mu = sum(xs) / n
    z = [math.floor((v - mu) ** 2 + 0.5) for v in xs]
    mz = sum(z) / n

    def acf(k):
        num = sum((z[t] - mz) * (z[t - k] - mz) for t in range(k, n))
        den = sum((v - mz) ** 2 for v in z)
        return num / den

    q = 0.0
    for k in range(1, 8):
        r = acf(k)
        q += r * r / (n - k)
        assert got[k]["rho_squared_series"] == pytest.approx(r, abs=2e-6)
        assert got[k]["mcleod_li_q"] == pytest.approx(
            n * (n + 2) * q, rel=1e-4
        )


def test_kupiec_matches_binomial_lr(spark, sf_dir, daily):
    row = q_kupiec_var_backtest(spark, sf_dir).collect()[0]
    xs = [daily[d] for d in sorted(daily)]
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((v - mu) ** 2 for v in xs) / n
    m3 = sum((v - mu) ** 3 for v in xs) / n
    g1 = m3 / m2**1.5
    from statistics import NormalDist

    zq = NormalDist().inv_cdf(0.05)
    var05 = mu + (zq + (zq * zq - 1) * g1 / 6) * math.sqrt(m2)
    x = sum(1 for v in xs if v < var05)
    lr = -2 * (
        (n - x) * math.log(0.95)
        + x * math.log(0.05)
        - (x * math.log(x / n) if x else 0.0)
        - ((n - x) * math.log(1 - x / n) if x < n else 0.0)
    )
    assert row["n_days"] == n
    assert row["var05_cf_dollars"] == pytest.approx(var05, abs=0.02)
    assert row["n_violations"] == x
    assert row["kupiec_lr"] == pytest.approx(lr, abs=1e-4)
    assert row["reject_5pct"] == (lr > 3.841)


def test_kupiec_lr_zero_at_perfect_calibration():
    # law: observed rate exactly p -> LR = 0
    n, p = 200, 0.05
    x = 10  # x/n = 0.05
    lr = -2 * (
        (n - x) * math.log(1 - p)
        + x * math.log(p)
        - x * math.log(x / n)
        - (n - x) * math.log(1 - x / n)
    )
    assert lr == pytest.approx(0.0, abs=1e-12)
