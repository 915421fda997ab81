"""ext180: literal re-derivations -- Taguchi Cpm/Cpmk vs the moment
loop (plus the loss-function law: tau >= sigma always, with equality
iff mean == target, so Cpmk <= Cpk with the gap growing in the
mean-target shift), Grubbs vs the max-normed-residual loop (plus the
table law: the n = 25 critical value matches the published 2.822,
and a planted gross outlier trips it while the clean fixture does
not), and Hoover vs the share loop (plus its bounds, the
equal-distribution zero, scale invariance, and the above-mean-excess
dual identity)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext180 import (
    _T_0001_23,
    q_grubbs_test,
    q_hoover_index,
    q_taguchi_cpm,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_taguchi_matches_loop(spark, sf_dir):
    row = q_taguchi_cpm(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    vk = sorted(
        (round(r[1] * 100) // 100, r[0]) for r in rows
    )
    n = len(vk)
    t = vk[math.ceil(0.5 * n) - 1][0]
    vals = [v for v, _ in vk]
    mu = sum(vals) / n
    tau = math.sqrt(sum((v - t) ** 2 for v in vals) / n)
    sig = math.sqrt(sum(v * v for v in vals) / n - mu * mu)
    lsl, usl = 0.5 * t, 1.5 * t
    half = min(usl - mu, mu - lsl)
    assert row["n_days"] == n
    assert row["target_dollars"] == t
    assert row["cpm"] == pytest.approx(t / (6 * tau), abs=1e-3)
    assert row["cpmk"] == pytest.approx(half / (3 * tau), abs=1e-3)
    assert row["cpk_normal"] == pytest.approx(half / (3 * sig), abs=1e-3)
    assert row["cpmk_minus_cpk"] == pytest.approx(
        half / (3 * tau) - half / (3 * sig), abs=2e-3
    )
    # loss-function law: tau^2 = sigma^2 + (mu - T)^2 >= sigma^2
    assert tau >= sig - 1e-9
    assert row["cpmk_minus_cpk"] <= 1e-12


def test_taguchi_centering_law():
    # centered process: tau == sigma, Cpmk == Cpk; shifted: Cpmk < Cpk
    vals = [10.0, 12.0, 14.0, 16.0, 18.0]

    def caps(vs, t):
        n = len(vs)
        mu = sum(vs) / n
        tau = math.sqrt(sum((v - t) ** 2 for v in vs) / n)
        sig = math.sqrt(sum((v - mu) ** 2 for v in vs) / n)
        return tau, sig

    tau_c, sig_c = caps(vals, 14.0)  # target at the mean
    assert tau_c == pytest.approx(sig_c, rel=1e-12)
    tau_s, sig_s = caps(vals, 10.0)  # target far from the mean
    assert tau_s > sig_s
    assert tau_s == pytest.approx(math.sqrt(sig_s**2 + 16.0), rel=1e-12)


def test_grubbs_matches_loop(spark, sf_dir):
    row = q_grubbs_test(spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nat = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    cents = {r[0]: round(r[1] * 100) for r in nat}
    n = len(cents)
    mu = sum(cents.values()) / n
    s = math.sqrt(
        sum((c - mu) ** 2 for c in cents.values()) / (n - 1)
    )
    g_by_nk = {nk: abs(c - mu) / s for nk, c in cents.items()}
    g_max = max(g_by_nk.values())
    best = min(nk for nk, g in g_by_nk.items() if g == g_max)
    t = _T_0001_23
    g_crit = (n - 1) / math.sqrt(n) * math.sqrt(t * t / (n - 2 + t * t))
    assert row["n_nations"] == n
    assert row["extreme_nation"] == best
    assert row["g_stat"] == pytest.approx(g_max, abs=1e-4)
    assert row["g_crit"] == pytest.approx(g_crit, abs=1e-6)
    assert row["reject_outlier"] == (g_max > g_crit)


def test_grubbs_table_and_rejection_law():
    # published two-sided 5% critical value at n = 25 is 2.822
    n = 25
    t = _T_0001_23
    g_crit = (n - 1) / math.sqrt(n) * math.sqrt(t * t / (n - 2 + t * t))
    assert g_crit == pytest.approx(2.822, abs=2e-3)

    def g_stat(vs):
        m = sum(vs) / len(vs)
        s = math.sqrt(
            sum((v - m) ** 2 for v in vs) / (len(vs) - 1)
        )
        return max(abs(v - m) for v in vs) / s

    clean = [float((7 * i) % 25) for i in range(25)]  # near-uniform
    assert g_stat(clean) < g_crit
    planted = clean[:-1] + [500.0]
    assert g_stat(planted) > g_crit


def test_hoover_matches_loop(spark, sf_dir):
    row = q_hoover_index(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    cents = [round(r[1] * 100) for r in rows]
    n = len(cents)
    s = sum(cents)
    excess = sum(max(n * c - s, 0) for c in cents)
    donors = sum(1 for c in cents if n * c > s)
    h = excess / (n * s)
    assert row["n_customers"] == n
    assert row["customers_above_mean"] == donors
    assert row["hoover_ppm"] == (1000000 * excess) // (n * s)
    assert row["hoover_index"] == pytest.approx(h, abs=1e-6)
    # dual identity: sum of above-mean surpluses == below-mean deficits
    deficit = sum(max(s - n * c, 0) for c in cents)
    assert excess == deficit
    assert 0.0 <= h <= 1.0 - 1.0 / n + 1e-12


def test_hoover_laws():
    def hoover(xs):
        n, s = len(xs), sum(xs)
        return sum(max(n * x - s, 0) for x in xs) / (n * s)

    assert hoover([5, 5, 5, 5]) == 0.0
    # one customer holds everything: H -> 1 - 1/n
    assert hoover([0, 0, 0, 100]) == pytest.approx(0.75)
    # scale invariance (integer scaling keeps exactness)
    base = [1, 4, 9, 16, 25]
    assert hoover(base) == pytest.approx(hoover([7 * x for x in base]))
    # transfer principle: moving value from poor to rich raises H
    assert hoover([10, 10, 20, 40]) < hoover([5, 10, 20, 45])
