"""ext138: literal re-derivations -- Fligner-Killeen via scipy-free
textbook scores (statistics.NormalDist inverse CDF, average ranks,
ANOVA on scores), Krippendorff's alpha from per-unit dictionaries,
Theil's U2 from the plain lag lists."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from statistics import NormalDist

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext138 import (
    q_fligner_killeen,
    q_krippendorff_alpha_returnflag,
    q_theil_u2_forecast,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_fligner_killeen_matches_textbook(spark, sf_dir):
    row = q_fligner_killeen(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["o_orderpriority"]].append(round(r["o_totalprice"] * 100))
    # lower weighted median (the query's definition: min v with
    # 2*cumcount >= n)
    devs = []
    for g, vals in groups.items():
        sv = sorted(vals)
        n_g = len(sv)
        med = sv[(n_g - 1) // 2] if n_g % 2 == 1 else sv[n_g // 2 - 1]
        # min v with 2*cc >= n: for even n that's element n/2 - 1 + 1?
        # re-derive exactly: cc of sorted index i (1-based) is i.
        import bisect

        med = sv[math.ceil(n_g / 2) - 1]
        devs.extend((g, abs(v - med)) for v in vals)
    nd = NormalDist()
    n = len(devs)
    # average ranks of the pooled deviations
    cnt = Counter(d for _, d in devs)
    cum = {}
    run = 0
    for d in sorted(cnt):
        run += cnt[d]
        cum[d] = run
    score = {
        d: nd.inv_cdf(0.5 + (cum[d] - (cnt[d] - 1) / 2) / (2 * (n + 1)))
        for d in cnt
    }
    per = defaultdict(list)
    for g, d in devs:
        per[g].append(score[d])
    allsc = [s for v in per.values() for s in v]
    abar = sum(allsc) / n
    v_var = sum((s - abar) ** 2 for s in allsc) / (n - 1)
    stat = sum(len(v) * (sum(v) / len(v) - abar) ** 2 for v in per.values()) / v_var
    assert row["n_total"] == n
    assert row["k_groups"] == len(per)
    assert row["df"] == len(per) - 1
    # e8 quantization + abs-DIV clearing + Acklam (|rel| < 1.15e-9 vs
    # the exact inverse CDF) -> statistic agrees to ~1e-4 relative
    assert row["fk_stat"] == pytest.approx(stat, rel=5e-4)


def test_krippendorff_matches_literal(spark, sf_dir):
    row = q_krippendorff_alpha_returnflag(spark, sf_dir).collect()[0]
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_returnflag")
        .collect()
    )
    units = defaultdict(Counter)
    for r in li:
        units[r["l_orderkey"]][r["l_returnflag"]] += 1
    kept = {u: c for u, c in units.items() if sum(c.values()) >= 2}
    n = sum(sum(c.values()) for c in kept.values())
    do = sum(
        ncu * (sum(c.values()) - ncu) / (sum(c.values()) - 1)
        for c in kept.values()
        for ncu in c.values()
    ) / n
    marg = Counter()
    for c in kept.values():
        marg.update(c)
    de = sum(nc * (n - nc) for nc in marg.values()) / (n * (n - 1))
    assert row["n_units"] == len(kept)
    assert row["n_pairable_values"] == n
    assert row["observed_disagreement"] == pytest.approx(do, abs=1e-6)
    assert row["expected_disagreement"] == pytest.approx(de, abs=1e-6)
    assert row["alpha"] == pytest.approx(1 - do / de, abs=1e-5)


def test_krippendorff_perfect_and_chance_limits():
    # formula sanity: identical values within every unit -> Do = 0 ->
    # alpha = 1; two categories split 50/50 within every unit ->
    # alpha < 0 (systematic disagreement)
    def alpha(units):
        kept = [c for c in units if sum(c.values()) >= 2]
        n = sum(sum(c.values()) for c in kept)
        do = sum(
            v * (sum(c.values()) - v) / (sum(c.values()) - 1)
            for c in kept
            for v in c.values()
        ) / n
        marg = Counter()
        for c in kept:
            marg.update(c)
        de = sum(m * (n - m) for m in marg.values()) / (n * (n - 1))
        return 1 - do / de

    perfect = [Counter({"A": 3}), Counter({"B": 4}), Counter({"A": 2})]
    assert alpha(perfect) == pytest.approx(1.0)
    worst = [Counter({"A": 1, "B": 1}) for _ in range(10)]
    assert alpha(worst) < 0


def test_theil_u2_matches_literal(spark, sf_dir):
    row = q_theil_u2_forecast(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    xs = [per[d] for d in sorted(per)]
    s7 = sum((xs[t - 7] - xs[t]) ** 2 for t in range(7, len(xs)))
    s1 = sum((xs[t - 1] - xs[t]) ** 2 for t in range(7, len(xs)))
    nsc = len(xs) - 7
    assert row["n_days_scored"] == nsc
    assert row["u2_seasonal_vs_naive"] == pytest.approx(
        math.sqrt(s7 / s1), abs=1e-5
    )
    assert row["rmse_seasonal_dollars"] == pytest.approx(
        math.sqrt(s7 / nsc) / 100, rel=1e-6
    )
    assert row["rmse_naive_dollars"] == pytest.approx(
        math.sqrt(s1 / nsc) / 100, rel=1e-6
    )
