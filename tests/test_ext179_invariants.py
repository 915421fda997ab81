"""ext179: literal re-derivations -- the robust-location suite vs a
sorted-list loop (plus the symmetry law: on a symmetric fixture all
five estimators coincide), percentile Cpk vs the order-stat loop
(plus the normal law: on near-normal data the two indices agree, on
a planted skew fixture they diverge with the percentile one
stricter on the long-tail side), and bicor vs a numpy loop on the
same quantization (plus the outlier-immunity law: one gross outlier
flips Pearson but barely moves bicor)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext179 import (
    q_biweight_midcorrelation,
    q_cpk_percentile_nonnormal,
    q_robust_location_suite,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def daily(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum", "*": "count"})
        .collect()
    )
    out = []
    for r in rows:
        n = int(r["count(1)"])
        cents = round(r["sum(o_totalprice)"] * 100)
        out.append((r[0], n, cents // n, cents // 100))
    out.sort()
    return out


def _orderstat(vals_with_key, p):
    n = len(vals_with_key)
    return sorted(vals_with_key)[math.ceil(p * n) - 1][0]


def test_robust_suite_matches_loop(spark, sf_dir, daily):
    row = q_robust_location_suite(spark, sf_dir).collect()[0]
    vk = [(v, d) for d, _, _, v in daily]
    n = len(vk)
    q1 = _orderstat(vk, 0.25)
    q2 = _orderstat(vk, 0.50)
    q3 = _orderstat(vk, 0.75)
    t1 = _orderstat(vk, 1 / 3)
    t2 = _orderstat(vk, 2 / 3)
    mean = sum(v for v, _ in vk) / n
    assert row["n_days"] == n
    assert row["mean_dollars"] == pytest.approx(mean, abs=0.01)
    assert row["median_dollars"] == q2
    assert row["gastwirth_dollars"] == pytest.approx(
        0.3 * t1 + 0.4 * q2 + 0.3 * t2, abs=0.01
    )
    assert row["trimean_dollars"] == pytest.approx(
        (q1 + 2 * q2 + q3) / 4, abs=0.01
    )
    assert row["midhinge_dollars"] == pytest.approx((q1 + q3) / 2, abs=0.01)
    assert row["mean_median_gap_iqr"] == pytest.approx(
        (mean - q2) / ((q3 - q1) / 2), abs=1e-4
    )


def test_robust_suite_symmetry_law():
    vals = list(range(-50, 51))  # perfectly symmetric
    vk = [(v, i) for i, v in enumerate(vals)]
    q1, q2, q3 = (_orderstat(vk, p) for p in (0.25, 0.5, 0.75))
    t1, t2 = _orderstat(vk, 1 / 3), _orderstat(vk, 2 / 3)
    mean = sum(vals) / len(vals)
    ests = [
        mean,
        q2,
        0.3 * t1 + 0.4 * q2 + 0.3 * t2,
        (q1 + 2 * q2 + q3) / 4,
        (q1 + q3) / 2,
    ]
    assert max(ests) - min(ests) <= 1  # nearest-rank granularity


def test_cpk_matches_loop(spark, sf_dir, daily):
    row = q_cpk_percentile_nonnormal(spark, sf_dir).collect()[0]
    vk = [(v, d) for d, _, _, v in daily]
    n = len(vk)
    p_lo = _orderstat(vk, 0.00135)
    p_med = _orderstat(vk, 0.5)
    p_hi = _orderstat(vk, 0.99865)
    vals = [v for v, _ in vk]
    mean = sum(vals) / n
    sig = math.sqrt(n * sum(v * v for v in vals) - sum(vals) ** 2) / n
    lsl, usl = 0.5 * p_med, 1.5 * p_med
    cpk_p = min((usl - p_med) / (p_hi - p_med), (p_med - lsl) / (p_med - p_lo))
    cpk_n = min((usl - mean) / (3 * sig), (mean - lsl) / (3 * sig))
    assert row["p00135_dollars"] == p_lo
    assert row["p99865_dollars"] == p_hi
    assert row["cpk_percentile"] == pytest.approx(cpk_p, abs=1e-3)
    assert row["cpk_normal"] == pytest.approx(cpk_n, abs=1e-3)
    assert row["percentile_minus_normal"] == pytest.approx(
        cpk_p - cpk_n, abs=2e-3
    )


def _bicor(xs, ys):
    n = len(xs)

    def med(v):
        return sorted(v)[math.ceil(0.5 * n) - 1]

    mx, my = med(xs), med(ys)
    madx = med([abs(x - mx) for x in xs])
    mady = med([abs(y - my) for y in ys])
    ax, ay = [], []
    for x, y in zip(xs, ys):
        ux = (x - mx) / (9 * madx)
        uy = (y - my) / (9 * mady)
        ax.append((x - mx) * (1 - ux * ux) ** 2 if abs(ux) < 1 else 0.0)
        ay.append((y - my) * (1 - uy * uy) ** 2 if abs(uy) < 1 else 0.0)
    sxy = sum(math.floor(a * b * 1e-3 + 0.5) for a, b in zip(ax, ay))
    sxx = sum(math.floor(a * a * 1e-3 + 0.5) for a in ax)
    syy = sum(math.floor(b * b * 1e-3 + 0.5) for b in ay)
    return sxy / math.sqrt(sxx * syy)


def test_bicor_matches_loop(spark, sf_dir, daily):
    row = q_biweight_midcorrelation(spark, sf_dir).collect()[0]
    # note the query's MAD order statistic tie-breaks by DATE, while
    # the plain loop sorts values only -- identical because the
    # selected VALUE at the ceil rank is the same under any tiebreak
    xs = [v for _, _, _, v in daily]
    ys = [a for _, _, a, _ in daily]
    expect = _bicor(xs, ys)
    assert row["n_days"] == len(xs)
    assert row["bicor_ticket_revenue"] == pytest.approx(expect, abs=1e-4)
    assert -1.0 <= row["bicor_ticket_revenue"] <= 1.0


def test_bicor_outlier_immunity_law():
    xs = [float(i) for i in range(40)]
    ys = [2.0 * i + ((-1) ** i) * 0.5 for i in range(40)]

    def pearson(a, b):
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        num = sum((x - ma) * (y - mb) for x, y in zip(a, b))
        return num / math.sqrt(
            sum((x - ma) ** 2 for x in a) * sum((y - mb) ** 2 for y in b)
        )

    base_p = pearson(xs, ys)
    assert base_p > 0.99
    ys_bad = ys[:-1] + [-100000.0]
    assert pearson(xs, ys_bad) < 0.2  # one point destroys Pearson

    # scale the fixture so the e-3 quantization grid is fine enough
    xs_s = [x * 1000 for x in xs]
    ys_s = [y * 10000 for y in ys]
    ys_bad_s = ys_s[:-1] + [-1000000000.0]
    assert _bicor(xs_s, ys_bad_s) > 0.9  # bicor shrugs it off
