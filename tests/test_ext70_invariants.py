"""Definition-level checks for the ext70 batch."""

from __future__ import annotations

import math

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext70 import (
    _ERLANG_MAX_C,
    _FACT_LIST,
    _SERVICE_SEC,
    q_erlang_c_staffing,
    q_iv_wald_estimate,
    q_oaxaca_blinder_gap,
    q_sharpe_sortino_daily,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_iv_wald_matches_literal_cells(spark, sf_dir):
    row = q_iv_wald_estimate(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_discount", "l_returnflag"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").toPandas()
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    df = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    z = (df.c_nationkey % 2).to_numpy()
    x = (df.l_discount >= 0.05).to_numpy()
    y = (df.l_returnflag == "R").to_numpy()
    p = lambda arr, zz: arr[z == zz].mean()  # noqa: E731
    rf = p(y, 1) - p(y, 0)
    fs = p(x, 1) - p(x, 0)
    assert row["n0"] == int((z == 0).sum()) and row["n1"] == int((z == 1).sum())
    assert abs(row["reduced_form"] - rf) < 1e-6
    assert abs(row["first_stage"] - fs) < 1e-6
    assert abs(row["wald_iv"] - rf / fs) < 1e-4
    # IV identity: wald = reduced form / first stage (on rounded values)
    assert abs(row["wald_iv"] * row["first_stage"] - row["reduced_form"]) < 1e-4


def test_oaxaca_identity_and_literal_fit(spark, sf_dir):
    row = q_oaxaca_blinder_gap(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_quantity", "l_extendedprice"
    ).toPandas()
    li = li[li.l_quantity > 0]
    g = (li.l_linestatus == "O").to_numpy()
    q = li.l_quantity.to_numpy().astype("int64")
    u = np.floor(100 * li.l_extendedprice.to_numpy() / li.l_quantity.to_numpy() + 0.5).astype("int64")

    def ols_slope(qq, uu):
        n = len(qq)
        sq, su = int(qq.sum()), int(uu.sum())
        sqq = int((qq.astype(object) * qq).sum())
        squ = int((qq.astype(object) * uu).sum())
        return (n * squ - sq * su) / (n * sqq - sq * sq)

    b_pool = ols_slope(q, u)
    ya, yb = u[g].mean(), u[~g].mean()
    xa, xb = q[g].mean(), q[~g].mean()
    assert row["n_open"] == int(g.sum()) and row["n_other"] == int((~g).sum())
    assert abs(row["pooled_slope"] - b_pool) < 1e-6
    assert abs(row["total_gap_cents"] - (ya - yb)) < 1e-5
    assert abs(row["explained_cents"] - b_pool * (xa - xb)) < 1e-5
    # the decomposition identity on the reported (rounded) numbers
    assert abs(
        row["total_gap_cents"] - row["explained_cents"] - row["unexplained_cents"]
    ) < 2e-6


def test_sharpe_sortino_matches_literal_returns(spark, sf_dir):
    row = q_sharpe_sortino_daily(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    days = o.o_orderdate.to_numpy()
    order = np.argsort(days, kind="mergesort")
    uniq, idx = np.unique(days[order], return_index=True)
    x = np.add.reduceat(cents[order], idx)
    r_e9 = [
        int(math.floor(1e9 * math.log(int(x[t]) / int(x[t - 1])) + 0.5))
        for t in range(1, len(x))
        if x[t - 1] > 0
    ]
    n = len(r_e9)
    mean = sum(r_e9) / n / 1e9
    var = (n * sum(v * v for v in r_e9) - sum(r_e9) ** 2) / (n * n)
    std = math.sqrt(var) / 1e9
    dstd = math.sqrt(sum(v * v for v in r_e9 if v < 0) / n) / 1e9
    assert row["n_returns"] == n
    assert abs(row["mean_logret"] - mean) < 1e-6
    assert abs(row["sharpe_annual"] - mean / std * math.sqrt(365)) < 1e-5
    assert abs(row["sortino_annual"] - mean / dstd * math.sqrt(365)) < 1e-5
    # underwater duration: longest run of days strictly below running peak
    peak, cur, best = -1, 0, 0
    for v in x:
        if v >= peak:
            peak, cur = v, 0
        else:
            cur += 1
            best = max(best, cur)
    assert row["max_underwater_days"] == best


def test_erlang_c_matches_literal_formula(spark, sf_dir):
    row = q_erlang_c_staffing(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select("ts").toPandas()
    us = ev.ts.astype("int64").to_numpy()  # pandas datetime64[ns] -> ns
    n = len(us)
    hours = (int(us.max()) - int(us.min())) / 3.6e12
    per_hour = n / hours
    a = per_hour * _SERVICE_SEC / 3600.0
    assert row["n_events"] == n
    assert abs(row["arrivals_per_hour"] - per_hour) < 1e-4
    assert abs(row["offered_erlangs"] - a) < 1e-6

    def erlang_c(c):
        if a >= c:
            return 1.0
        s = sum(a**k / _FACT_LIST[k] for k in range(c))
        top = a**c / _FACT_LIST[c] * (c / (c - a))
        return top / (s + top)

    wanted = next(
        (c for c in range(1, _ERLANG_MAX_C + 1) if erlang_c(c) <= 0.2), None
    )
    assert row["agents_for_20pct"] == wanted
    if wanted is not None:
        assert abs(row["wait_prob_at_min"] - erlang_c(wanted)) < 1e-6
        # Erlang C decreases in c; the chosen c is minimal
        if wanted > 1:
            assert erlang_c(wanted - 1) > 0.2
