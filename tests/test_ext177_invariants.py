"""ext177: literal re-derivations -- seasonal MK vs a per-weekday pair
loop (plus the seasonality-cancellation law: a pure weekly cycle with
no trend gives S = 0 exactly, where plain MK sees spurious pairs),
CUSUMSQ vs the prefix-share loop (plus the variance-break law: a
planted late volatility regime pushes the path below the diagonal),
and runs up/down vs the sign-run loop (plus the alternating-series
law R = n - 1, the maximum)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext177 import (
    q_cusumsq_variance_stability,
    q_runs_up_down_test,
    q_seasonal_mann_kendall,
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
    return sorted(per.items())


def _smk(items):
    """items: [(date, value)] sorted by date."""
    by_dow = defaultdict(list)
    for d, v in items:
        wd = d.weekday() if hasattr(d, "weekday") else d.date().weekday()
        by_dow[wd].append(v)
    s_tot = 0
    var18 = 0
    for vs in by_dow.values():
        n = len(vs)
        s_tot += sum(
            (1 if vs[j] > vs[i] else (-1 if vs[j] < vs[i] else 0))
            for i in range(n)
            for j in range(i + 1, n)
        )
        var18 += n * (n - 1) * (2 * n + 5)
    cc = 1.0 if s_tot > 0 else (-1.0 if s_tot < 0 else 0.0)
    z = (s_tot - cc) / math.sqrt(var18 / 18.0)
    return s_tot, var18, z


def test_smk_matches_loop(spark, sf_dir, series):
    row = q_seasonal_mann_kendall(spark, sf_dir).collect()[0]
    s_tot, var18, z = _smk(series)
    assert row["n_seasons"] == 7
    assert row["s_pooled"] == s_tot
    assert row["z"] == pytest.approx(z, abs=1e-4)
    assert row["p_two_sided"] == pytest.approx(
        math.erfc(abs(z) / math.sqrt(2)), abs=2e-6
    )


def test_smk_seasonality_cancellation_law():
    import datetime

    # pure weekly cycle, zero trend: within each weekday all values
    # equal -> every sgn is 0 -> S == 0 exactly
    d0 = datetime.date(2020, 1, 6)
    items = [
        (d0 + datetime.timedelta(days=t), [10, 90, 40, 70, 20, 60, 30][t % 7])
        for t in range(70)
    ]
    s_tot, _, _ = _smk(items)
    assert s_tot == 0
    # plain MK on the same series is NOT zero (the cycle pollutes it)
    vs = [v for _, v in items]
    s_plain = sum(
        (1 if vs[j] > vs[i] else (-1 if vs[j] < vs[i] else 0))
        for i in range(len(vs))
        for j in range(i + 1, len(vs))
    )
    assert s_plain != 0


def test_cusumsq_matches_loop(spark, sf_dir, series):
    row = q_cusumsq_variance_stability(spark, sf_dir).collect()[0]
    vs = [v for _, v in series]
    n = len(vs)
    s_tot = sum(vs)
    us = [v * n - s_tot for v in vs]
    c_n = sum(u * u for u in us)
    run = 0
    devs = []
    for t, u in enumerate(us, 1):
        run += u * u
        devs.append(math.floor(abs(run / c_n - t / n) * 1e12 + 0.5))
    mx = max(devs)
    argmax = devs.index(mx) + 1
    stat = mx / 1e12 * math.sqrt(n / 2)
    assert row["n_days"] == n
    assert row["max_dev"] == pytest.approx(mx / 1e12, abs=1e-6)
    assert row["argmax_day_index"] == argmax
    assert row["scaled_stat"] == pytest.approx(stat, abs=1e-3)
    assert row["reject_5pct_approx"] == (stat > 1.358)


def test_cusumsq_variance_break_law():
    # stable low variance then a late high-variance regime: the
    # squared-share path lags the diagonal, max_dev large
    vs = [100 + (1 if t % 2 else -1) for t in range(200)]
    vs += [100 + (50 if t % 2 else -50) for t in range(200)]
    n = len(vs)
    s_tot = sum(vs)
    us = [v * n - s_tot for v in vs]
    c_n = sum(u * u for u in us)
    run, worst = 0, 0.0
    for t, u in enumerate(us, 1):
        run += u * u
        worst = max(worst, abs(run / c_n - t / n))
    assert worst > 0.4  # far outside any plausible band


def test_runs_ud_matches_loop(spark, sf_dir, series):
    row = q_runs_up_down_test(spark, sf_dir).collect()[0]
    vs = [v for _, v in series]
    sgns = [
        1 if b > a else -1
        for a, b in zip(vs, vs[1:])
        if b != a
    ]
    runs = 1 + sum(
        1 for i in range(1, len(sgns)) if sgns[i] != sgns[i - 1]
    )
    n = len(sgns) + 1
    er = (2 * n - 1) / 3
    z = (runs - er) / math.sqrt((16 * n - 29) / 90)
    assert row["n_values"] == n
    assert row["n_runs"] == runs
    assert row["expected_runs"] == pytest.approx(er, abs=0.01)
    assert row["z"] == pytest.approx(z, abs=1e-4)
    assert row["p_two_sided"] == pytest.approx(
        math.erfc(abs(z) / math.sqrt(2)), abs=2e-6
    )


def test_runs_ud_alternating_law():
    vs = [10, 20, 10, 20, 10, 20, 10]
    sgns = [1 if b > a else -1 for a, b in zip(vs, vs[1:])]
    runs = 1 + sum(
        1 for i in range(1, len(sgns)) if sgns[i] != sgns[i - 1]
    )
    assert runs == len(sgns)  # every diff is its own run: the maximum
