"""Definition-level checks for the ext8 batch: the clamped-balance and
stickiness queries use window rewrites whose oracles differ (good --
the hash gate checks those), but chi-square and conversion stats share
formulation with their oracles, so re-derive them independently here;
the clamped balance additionally gets the literal sequential fold.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext8 import (
    q_chi2_independence,
    q_clamped_running_balance,
    q_conversion_time_stats,
    q_percentile_bucket_join,
    q_stickiness_dau_wau,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_chi2_matches_scipy_free_recompute(spark, sf_dir):
    got = q_chi2_independence(spark, sf_dir).toPandas()
    obs = got.pivot(index="rf", columns="ls", values="obs").fillna(0)
    n = obs.values.sum()
    # margins in the result must equal pivot margins
    for r in got.itertuples():
        assert r.row_n == obs.loc[r.rf].sum()
        assert r.col_n == obs[r.ls].sum()
        exp = r.row_n * r.col_n / n
        assert math.isclose(r.expected, exp, rel_tol=1e-9, abs_tol=5e-7)
        assert math.isclose(r.chi2_term, (r.obs - exp) ** 2 / exp, rel_tol=1e-6, abs_tol=5e-7)


def test_percentile_buckets_partition_all_orders(spark, sf_dir):
    got = q_percentile_bucket_join(spark, sf_dir).toPandas().sort_values("bucket_id")
    orders = read_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()
    assert got["n"].sum() == len(orders), "every order in exactly one bucket"
    assert list(got["bucket_id"]) == list(range(10))
    # deciles: each bucket holds ~10% (interpolated cuts, so not exact)
    assert (got["n"] > 0.05 * len(orders)).all()
    assert (got["n"] < 0.15 * len(orders)).all()
    # buckets tile the range in order
    assert (got["hi_price"].values[:-1] <= got["lo_price"].values[1:] + 1e-9).all()


def test_clamped_balance_matches_sequential_fold(spark, sf_dir):
    got = (
        q_clamped_running_balance(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "event_id"])
    )
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
        .toPandas()
        .sort_values(["user_id", "event_id"])
    )
    ev["flow"] = ev.apply(
        lambda r: -r["cents"] if r["event_type"] in ("purchase", "error") else r["cents"],
        axis=1,
    )
    expected = []
    for _, grp in ev.groupby("user_id"):
        b = 0
        for x in grp["flow"]:
            b = max(0, b + x)  # the literal recurrence the rewrite replaces
            expected.append(b)
    assert list(got["balance_cents"]) == expected
    assert (got["balance_cents"] >= 0).all()


def test_conversion_stats_match_pandas(spark, sf_dir):
    got = q_conversion_time_stats(spark, sf_dir).toPandas().iloc[0]
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .toPandas()
    )
    s = ev[ev.event_type == "signup"].groupby("user_id")["us"].min()
    p = ev[ev.event_type == "purchase"].groupby("user_id")["us"].min()
    d = (p - s).dropna()
    d = d[d >= 0]
    assert int(got["n_converted"]) == len(d)
    assert int(got["min_us"]) == int(d.min())
    assert int(got["max_us"]) == int(d.max())
    assert int(got["mean_us"]) == int(d.sum()) // len(d)
    assert float(got["p50_us"]) == round(d.quantile(0.5, interpolation="linear"), 4)


def test_stickiness_bounds_and_window_edges(spark, sf_dir):
    got = q_stickiness_dau_wau(spark, sf_dir).toPandas().sort_values("day")
    # DAU <= WAU always, so stickiness in (0, 1]
    assert (got["dau"] <= got["wau"]).all()
    assert ((got["stickiness"] > 0) & (got["stickiness"] <= 1)).all()
    # recompute WAU literally for first/middle/last day
    pairs = (
        read_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .toPandas()
    )
    pairs["d"] = pd.to_datetime(pairs["d"])
    for day in [got["day"].iloc[0], got["day"].iloc[len(got) // 2], got["day"].iloc[-1]]:
        dt = pd.Timestamp(day)
        wau = pairs[(pairs["d"] >= dt - pd.Timedelta(days=6)) & (pairs["d"] <= dt)][
            "user_id"
        ].nunique()
        assert int(got[got["day"] == day]["wau"].iloc[0]) == wau
