"""ext175: literal re-derivations -- each smoothing fold vs a python
loop on the same 56-day window, plus definition-level laws: a
noiseless level+weekly fixture is fit exactly by Holt-Winters
(seasonal amplitude recovered, RMSE -> 0 after burn-in), phi = 1
collapses damped trend to plain Holt, and the Theta method on an
exactly linear series reproduces the linear extrapolation."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext175 import (
    _AL,
    _AL_D,
    _AL_T,
    _BE,
    _BE_D,
    _FIT_DAYS,
    _GA,
    _PHI,
    q_damped_trend_forecast,
    q_holt_winters_weekly,
    q_theta_method_forecast,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def window(spark, sf_dir):
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    import datetime

    per = {r[0]: float(round(r[1] * 100)) for r in daily}
    # replicate the query's CALENDAR window: d > max(d) - 56 days
    # (at sf0.001 the calendar is sparse, so fewer than 56 observations)
    mx = max(per)
    cut = mx - datetime.timedelta(days=_FIT_DAYS)
    days = sorted(d for d in per if d > cut)
    return [per[d] for d in days]


def _hw(ys, al=_AL, be=_BE, ga=_GA):
    l = sum(ys[:7]) / 7.0
    b = (sum(ys[7:14]) - sum(ys[:7])) / 49.0
    sv = [y - l for y in ys[:7]]
    sse = 0.0
    for x in ys[7:]:
        pred = l + b + sv[0]
        sse += (x - pred) ** 2
        nl = al * (x - sv[0]) + (1 - al) * (l + b)
        nb = be * (nl - l) + (1 - be) * b
        sv = sv[1:] + [ga * (x - nl) + (1 - ga) * sv[0]]
        l, b = nl, nb
    return l, b, sv, sse


def test_hw_matches_loop(spark, sf_dir, window):
    row = q_holt_winters_weekly(spark, sf_dir).collect()[0]
    ys = window
    l, b, sv, sse = _hw(ys)
    n = len(ys)
    assert row["n_fit_days"] == n
    assert row["level_dollars"] == pytest.approx(l / 100, abs=0.02)
    assert row["trend_dollars_per_day"] == pytest.approx(b / 100, abs=0.02)
    assert row["seasonal_amplitude_dollars"] == pytest.approx(
        (max(sv) - min(sv)) / 100, abs=0.02
    )
    assert row["forecast_next7_dollars"] == pytest.approx(
        (7 * l + 28 * b + sum(sv)) / 100, abs=0.05
    )
    assert row["rmse_1step_dollars"] == pytest.approx(
        math.sqrt(sse / (n - 7)) / 100, abs=0.02
    )


def test_hw_noiseless_seasonal_law():
    pattern = [100.0, 300.0, 50.0, 220.0, 180.0, 90.0, 400.0]
    ys = [pattern[t % 7] for t in range(56)]
    l, b, sv, sse = _hw(ys)
    # exact fit after the seed: every one-step prediction is perfect
    assert sse == pytest.approx(0.0, abs=1e-9)
    assert max(sv) - min(sv) == pytest.approx(
        max(pattern) - min(pattern), abs=1e-9
    )
    assert b == pytest.approx(0.0, abs=1e-9)


def _damped(ys, al=_AL_D, be=_BE_D, ph=_PHI):
    l, b, sse = ys[0], 0.0, 0.0
    for x in ys[1:]:
        pred = l + ph * b
        sse += (x - pred) ** 2
        nl = al * x + (1 - al) * (l + ph * b)
        nb = be * (nl - l) + (1 - be) * ph * b
        l, b = nl, nb
    return l, b, sse


def test_damped_matches_loop(spark, sf_dir, window):
    row = q_damped_trend_forecast(spark, sf_dir).collect()[0]
    ys = window
    l, b, sse = _damped(ys)
    n = len(ys)
    wsum = sum(
        sum(_PHI**i for i in range(1, h + 1)) for h in range(1, 8)
    )
    assert row["level_dollars"] == pytest.approx(l / 100, abs=0.02)
    assert row["trend_dollars_per_day"] == pytest.approx(b / 100, abs=0.02)
    assert row["forecast_next7_dollars"] == pytest.approx(
        (7 * l + b * wsum) / 100, abs=0.05
    )
    assert row["asymptote_dollars"] == pytest.approx(
        (l + b * _PHI / (1 - _PHI)) / 100, abs=0.05
    )
    assert row["rmse_1step_dollars"] == pytest.approx(
        math.sqrt(sse / (n - 1)) / 100, abs=0.02
    )


def test_damped_phi_one_is_holt_law():
    ys = [100.0, 120.0, 90.0, 150.0, 130.0, 160.0, 170.0, 140.0]

    def holt(al, be):
        l, b = ys[0], 0.0
        for x in ys[1:]:
            nl = al * x + (1 - al) * (l + b)
            nb = be * (nl - l) + (1 - be) * b
            l, b = nl, nb
        return l, b

    l1, b1 = holt(0.3, 0.1)
    l2, b2, _ = _damped(ys, al=0.3, be=0.1, ph=1.0)
    assert (l1, b1) == pytest.approx((l2, b2), abs=1e-12)
    # and the damped h-step weight sum is strictly below the Holt one
    assert sum(_PHI**i for i in range(1, 8)) < 7


def test_theta_matches_loop(spark, sf_dir, window):
    row = q_theta_method_forecast(spark, sf_dir).collect()[0]
    ys = window
    n = len(ys)
    st = sum(range(1, n + 1))
    stt = sum(t * t for t in range(1, n + 1))
    sy = sum(ys)
    sty = sum(t * y for t, y in zip(range(1, n + 1), ys))
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    zs = [2 * y - (a + b * t) for t, y in zip(range(1, n + 1), ys)]
    s = zs[0]
    for z in zs[1:]:
        s = _AL_T * z + (1 - _AL_T) * s
    fc = 0.5 * (7 * a + b * (7 * n + 28)) + 0.5 * 7 * s
    assert row["n_fit_days"] == n
    assert row["ols_slope_dollars_per_day"] == pytest.approx(
        b / 100, abs=0.02
    )
    assert row["theta2_ses_dollars"] == pytest.approx(s / 100, abs=0.02)
    assert row["forecast_next7_dollars"] == pytest.approx(
        fc / 100, abs=0.05
    )


def test_theta_linear_series_law():
    # exactly linear series: theta-2 line equals the series itself
    # reflected about the trend -> SES sits ON the trend at the end,
    # and the combined forecast equals the linear extrapolation of a
    # zero-curvature series up to SES lag
    a0, b0, n = 50.0, 3.0, 56
    ys = [a0 + b0 * t for t in range(1, n + 1)]
    st = sum(range(1, n + 1))
    stt = sum(t * t for t in range(1, n + 1))
    sy = sum(ys)
    sty = sum(t * y for t, y in zip(range(1, n + 1), ys))
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    assert (a, b) == pytest.approx((a0, b0), abs=1e-9)
    zs = [2 * y - (a + b * t) for t, y in zip(range(1, n + 1), ys)]
    # theta-2 line of a perfect trend IS the trend line itself
    assert zs == pytest.approx(ys, abs=1e-9)
