"""ext152: literal re-derivations -- L-moments from the sorted-sample
definition (per-element binomial weights, no hockey-stick), the GEV
fit against the same Hosking chain with math.gamma (vs the A&S
polynomial), and Kadane via the textbook O(n) loop."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext152 import (
    q_gev_lmoments_fit,
    q_kadane_best_streak,
    q_l_moments_acctbal,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _lmoments(xs):
    xs = sorted(xs)
    n = len(xs)
    b = [0.0] * 4
    for i, x in enumerate(xs, 1):  # 1-based rank
        b[0] += x
        b[1] += (i - 1) * x
        b[2] += (i - 1) * (i - 2) / 2 * x
        b[3] += (i - 1) * (i - 2) * (i - 3) / 6 * x
    b0 = b[0] / n
    b1 = b[1] / (n * (n - 1))
    b2 = 2 * b[2] / (n * (n - 1) * (n - 2)) / 1  # C(i-1,2) already /2
    b3 = 6 * b[3] / (n * (n - 1) * (n - 2) * (n - 3)) / 1
    l1 = b0
    l2 = 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    return l1, l2, l3 / l2, l4 / l2


def test_l_moments_match_sorted_definition(spark, sf_dir):
    row = q_l_moments_acctbal(spark, sf_dir).collect()[0]
    xs = [
        round(r["c_acctbal"] * 100)
        for r in read_table(spark, sf_dir, "customer").collect()
    ]
    l1, l2, t3, t4 = _lmoments(xs)
    assert row["n_customers"] == len(xs)
    assert row["l1_dollars"] == pytest.approx(l1 / 100, abs=1e-3)
    assert row["l2_dollars"] == pytest.approx(l2 / 100, abs=1e-3)
    assert row["l_skew_t3"] == pytest.approx(t3, abs=1e-5)
    assert row["l_kurt_t4"] == pytest.approx(t4, abs=1e-5)
    assert row["l_cv"] == pytest.approx(l2 / l1, abs=1e-5)
    # Hosking bounds: |t3| < 1, t4 in [-0.25, 1)
    assert abs(row["l_skew_t3"]) < 1
    assert -0.25 <= row["l_kurt_t4"] < 1


def test_l_moments_uniform_theory():
    # uniform distribution: t3 = 0, t4 = 0 in the limit; L-CV = 1/3
    xs = list(range(1, 5001))
    l1, l2, t3, t4 = _lmoments(xs)
    assert t3 == pytest.approx(0.0, abs=1e-3)
    assert t4 == pytest.approx(0.0, abs=1e-3)
    assert l2 / l1 == pytest.approx(1 / 3, abs=1e-3)


def test_gev_fit_matches_hosking_chain(spark, sf_dir):
    row = q_gev_lmoments_fit(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    weekly = {}
    for r in daily:
        d = r[0]
        iso = d - __import__("datetime").timedelta(days=d.weekday())
        v = round(r[1] * 100) // 100
        weekly[iso] = max(weekly.get(iso, 0), v)
    xs = list(weekly.values())
    l1, l2, t3, t4 = _lmoments(xs)
    c = 2 / (3 + t3) - math.log(2) / math.log(3)
    k = 7.8590 * c + 2.9554 * c * c
    sigma = l2 * k / ((1 - 2**-k) * math.gamma(1 + k))
    mu = l1 - sigma * (1 - math.gamma(1 + k)) / k
    rl = mu + sigma / k * ((-math.log(1 - 1 / 52)) ** (-k) - 1)
    assert row["n_weeks"] == len(xs)
    assert row["gev_shape_kappa"] == pytest.approx(k, abs=1e-5)
    # A&S gamma poly |err| < 3e-7 -> sigma/mu to ~1e-4 relative
    assert row["gev_scale_dollars"] == pytest.approx(sigma, rel=2e-4)
    assert row["gev_location_dollars"] == pytest.approx(mu, rel=2e-4)
    assert row["return_level_52wk_dollars"] == pytest.approx(rl, rel=5e-4)
    # the 1-year return level must exceed the location
    assert row["return_level_52wk_dollars"] > row["gev_location_dollars"]


def test_kadane_matches_textbook_loop(spark, sf_dir):
    row = q_kadane_best_streak(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    xs = [per[d] for d in sorted(per)]
    n = len(xs)
    s = sum(xs)
    u = [x * n - s for x in xs]
    best = cur = u[0]
    best_len = cur_len = 1
    for v in u[1:]:
        if cur > 0:
            cur += v
            cur_len += 1
        else:
            cur = v
            cur_len = 1
        if cur > best:
            best, best_len = cur, cur_len
    assert row["excess_revenue_dollars"] == pytest.approx(
        best / n / 100, abs=0.01
    )
    assert row["streak_days"] == best_len
    assert row["excess_revenue_dollars"] > 0
