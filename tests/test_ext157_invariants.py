"""ext157: literal re-derivations -- the medcouple from the full
kernel enumeration (plus sign fixtures on skewed data), KZ(5,3) from
plain list convolutions."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext157 import (
    q_kz_filter_smoothness,
    q_medcouple_skew_daily,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _medcouple(xs):
    sv = sorted(xs)
    n = len(sv)
    m = sv[math.ceil(n / 2) - 1]  # min v with 2*rank >= n
    left = [v for v in xs if v <= m]
    right = [v for v in xs if v >= m]
    hs = sorted(
        ((b - m) - (m - a)) / (b - a)
        for a in left
        for b in right
        if a < b
    )
    k = len(hs)
    return m, hs[math.ceil(k / 2) - 1]


@pytest.fixture(scope="module")
def dollars(spark, sf_dir):
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    return sorted((r[0], round(r[1] * 100) // 100) for r in daily)


def test_medcouple_matches_enumeration(spark, sf_dir, dollars):
    row = q_medcouple_skew_daily(spark, sf_dir).collect()[0]
    xs = [v for _, v in dollars]
    m, mc = _medcouple(xs)
    sv = sorted(xs)
    n = len(sv)
    q1 = sv[math.ceil(n / 4) - 1]
    q3 = sv[math.ceil(3 * n / 4) - 1]
    if mc >= 0:
        lo = q1 - 1.5 * math.exp(-4 * mc) * (q3 - q1)
        hi = q3 + 1.5 * math.exp(3 * mc) * (q3 - q1)
    else:
        lo = q1 - 1.5 * math.exp(-3 * mc) * (q3 - q1)
        hi = q3 + 1.5 * math.exp(4 * mc) * (q3 - q1)
    assert row["median_dollars"] == m
    assert row["medcouple"] == pytest.approx(mc, abs=1e-6)
    assert row["adjusted_fence_lo"] == pytest.approx(lo, abs=0.02)
    assert row["adjusted_fence_hi"] == pytest.approx(hi, abs=0.02)
    assert row["n_low_outliers"] == sum(1 for v in xs if v < lo)
    assert row["n_high_outliers"] == sum(1 for v in xs if v > hi)
    assert -1 <= row["medcouple"] <= 1


def test_medcouple_sign_fixtures():
    # right-skewed sample -> MC > 0; symmetric -> MC == 0
    right = [1, 2, 3, 4, 5, 6, 7, 8, 9, 30, 40, 80]
    _, mc_r = _medcouple(right)
    assert mc_r > 0
    sym = list(range(-10, 11))
    _, mc_s = _medcouple(sym)
    assert mc_s == pytest.approx(0.0, abs=1e-12)


def test_kz_matches_list_convolution(spark, sf_dir, dollars):
    row = q_kz_filter_smoothness(spark, sf_dir).collect()[0]
    xs = [v * 100 for _, v in dollars]  # back to cents
    # recompute daily cents exactly (dollars fixture floored them) --
    # use the query's own raw series instead
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    xs = [per[d] for d in sorted(per)]

    def ma5_sums(v):
        return [sum(v[i - 2 : i + 3]) for i in range(2, len(v) - 2)]

    s1 = ma5_sums(xs)
    s2 = ma5_sums(s1)
    s3 = ma5_sums(s2)
    raw = xs[6 : len(xs) - 6]
    assert row["n_days_smoothed"] == len(s3) == len(raw)

    def sd(v):
        n = len(v)
        mu = sum(v) / n
        return math.sqrt(sum((x - mu) ** 2 for x in v) / n)

    assert row["sd_raw_dollars"] == pytest.approx(sd(raw) / 100, abs=0.02)
    assert row["sd_kz_dollars"] == pytest.approx(sd(s3) / 125 / 100, abs=0.02)
    assert row["variance_ratio"] == pytest.approx(
        (sd(s3) / 125) ** 2 / sd(raw) ** 2, abs=1e-5
    )
    # smoothing must REDUCE variance
    assert row["variance_ratio"] < 1
