"""Definition-level checks for the ext16 batch: Welch t and SMD
against scipy-free closed forms, LTV monotonicity + pandas recompute,
grouped OLS against numpy per group, expected shortfall against a
sorted-tail recompute.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext16 import (
    q_covariate_balance_smd,
    q_expected_shortfall,
    q_grouped_ols_trends,
    q_ltv_curve,
    q_welch_t_test,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_welch_matches_closed_form(spark, sf_dir):
    got = q_welch_t_test(spark, sf_dir).toPandas().iloc[0]
    orders = read_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice").toPandas()
    urgent = (orders[orders.o_orderpriority == "1-URGENT"]["o_totalprice"] * 100).round()
    low = (orders[orders.o_orderpriority == "5-LOW"]["o_totalprice"] * 100).round()
    assert int(got.n_urgent) == len(urgent) and int(got.n_low) == len(low)
    v1, v0 = urgent.var(ddof=1), low.var(ddof=1)
    n1, n0 = len(urgent), len(low)
    se2 = v1 / n1 + v0 / n0
    t = (urgent.mean() - low.mean()) / math.sqrt(se2)
    df = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v0 / n0) ** 2 / (n0 - 1))
    assert math.isclose(float(got.t_stat), t, abs_tol=1e-4)
    assert math.isclose(float(got.welch_df), df, rel_tol=1e-4)


def test_ltv_curve_is_monotone_and_matches_pandas(spark, sf_dir):
    got = q_ltv_curve(spark, sf_dir).toPandas().sort_values("week")
    assert got["cum_ltv_per_user"].is_monotonic_increasing
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_type", "value").toPandas()
    first = ev.groupby("user_id")["ts"].min().dt.normalize()
    n_users = ev["user_id"].nunique()
    p = ev[ev.event_type == "purchase"].copy()
    p["wk"] = (
        (p["ts"].dt.normalize() - p["user_id"].map(first)).dt.days // 7
    )
    p["cents"] = (p["value"] * 100).round().astype("int64")
    weekly = p.groupby("wk")["cents"].sum().sort_index().cumsum()
    for r in got.itertuples():
        assert math.isclose(
            r.cum_ltv_per_user, weekly[r.week] / n_users / 100.0, abs_tol=1e-4
        )


def test_smd_matches_closed_form(spark, sf_dir):
    got = q_covariate_balance_smd(spark, sf_dir).toPandas().set_index("cov")
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type").toPandas()
    per = (
        ev.pivot_table(index="user_id", columns="event_type", aggfunc="size", fill_value=0)
        .rename(columns={"view": "views", "click": "clicks", "error": "errors"})
    )
    per["variant"] = per.index % 2
    for cov in ("views", "clicks", "errors"):
        a = per[per.variant == 0][cov]
        b = per[per.variant == 1][cov]
        smd = (b.mean() - a.mean()) / math.sqrt((b.var(ddof=1) + a.var(ddof=1)) / 2)
        assert math.isclose(float(got.loc[cov, "smd"]), smd, abs_tol=1e-5)
        # randomized by parity: arms should be roughly balanced
        assert abs(float(got.loc[cov, "smd"])) < 1.0


def test_grouped_ols_matches_numpy_per_group(spark, sf_dir):
    got = q_grouped_ols_trends(spark, sf_dir).toPandas().set_index("nation")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice").toPandas()
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey").toPandas()
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name").toPandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["x"] = (pd.to_datetime(j["o_orderdate"]) - pd.Timestamp("1992-01-01")).dt.days
    j["y"] = (j["o_totalprice"] * 100).round()
    for nat, grp in j.groupby("n_name"):
        slope = np.polyfit(grp["x"].astype(float), grp["y"].astype(float), 1)[0]
        assert int(got.loc[nat, "n_orders"]) == len(grp)
        assert math.isclose(
            float(got.loc[nat, "slope_dollars_per_day"]), slope / 100.0, abs_tol=1e-6
        )


def test_expected_shortfall_matches_sorted_tail(spark, sf_dir):
    got = q_expected_shortfall(spark, sf_dir).toPandas().iloc[0]
    prices = read_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()["o_totalprice"]
    p95 = prices.quantile(0.95, interpolation="linear")
    tail = prices[prices >= p95]
    assert int(got.n_tail) == len(tail)
    assert math.isclose(float(got.p95_threshold), round(p95, 4), abs_tol=1e-9)
    cents = (tail * 100).round()
    es = round(round(cents.sum() / 100.0, 4) / len(tail), 6)
    assert math.isclose(float(got.expected_shortfall), es, abs_tol=1e-9)
    # ES must sit above the threshold
    assert float(got.expected_shortfall) >= float(got.p95_threshold)
