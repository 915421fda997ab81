"""Definition-level checks for the ext10 batch: z-test and MAPE against
scipy-free closed forms in python, bounce sessions against a literal
replay, Theil-Sen against numpy median of brute-force slopes, lift
table against a pandas recompute.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext10 import (
    q_ab_test_proportions,
    q_bounce_rate_daily,
    q_forecast_backtest_mape,
    q_lift_gains_table,
    q_theil_sen_slope,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _events(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .toPandas()
    )


def test_ab_test_matches_closed_form(spark, sf_dir):
    got = q_ab_test_proportions(spark, sf_dir).toPandas().iloc[0]
    ev = _events(spark, sf_dir)
    conv = (
        ev.assign(c=((ev.event_type == "purchase") & (ev.value > 150)).astype(int))
        .groupby("user_id")["c"]
        .max()
    )
    arms = conv.groupby(conv.index % 2).agg(["count", "sum"])
    n_a, x_a = arms.loc[0, "count"], arms.loc[0, "sum"]
    n_b, x_b = arms.loc[1, "count"], arms.loc[1, "sum"]
    assert (int(got.n_a), int(got.x_a), int(got.n_b), int(got.x_b)) == (
        n_a, x_a, n_b, x_b,
    )
    p = (x_a + x_b) / (n_a + n_b)
    z = (x_a / n_a - x_b / n_b) / math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
    assert math.isclose(float(got.z_score), z, abs_tol=1e-6)


def test_forecast_backtest_matches_numpy_ols(spark, sf_dir):
    got = q_forecast_backtest_mape(spark, sf_dir).toPandas().iloc[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("y"))
        .toPandas()
        .sort_values("d")
    )
    daily["x"] = (pd.to_datetime(daily["d"]) - pd.Timestamp("1992-01-01")).dt.days
    cut = pd.Timestamp("1997-01-01")
    tr = daily[pd.to_datetime(daily["d"]) < cut]
    te = daily[pd.to_datetime(daily["d"]) >= cut]
    slope, intercept = np.polyfit(tr["x"].astype(float), tr["y"].astype(float), 1)
    assert int(got.n_train) == len(tr) and int(got.n_test) == len(te)
    assert math.isclose(float(got.slope_dollars_per_day), slope / 100.0, rel_tol=1e-5)
    pred = intercept + slope * te["x"].astype(float)
    mape = float((np.abs(te["y"] - pred) / te["y"]).mean())
    assert math.isclose(float(got.mape), mape, abs_tol=1e-6)


def test_bounce_rate_matches_session_replay(spark, sf_dir):
    got = q_bounce_rate_daily(spark, sf_dir).toPandas().set_index("day")
    ev = _events(spark, sf_dir).sort_values(["user_id", "ts", "event_id"])
    sessions = []  # (start_day, n_events)
    for _, grp in ev.groupby("user_id"):
        start, n, last = None, 0, None
        for t in grp["ts"]:
            if last is None or (t - last).total_seconds() > 7200:
                if start is not None:
                    sessions.append((start.date(), n))
                start, n = t, 0
            n += 1
            last = t
        sessions.append((start.date(), n))
    df = pd.DataFrame(sessions, columns=["day", "n"])
    per = df.groupby("day").agg(n_sessions=("n", "size"), n_bounces=("n", lambda s: (s == 1).sum()))
    for day, row in per.iterrows():
        key = day.strftime("%Y-%m-%d")
        assert int(got.loc[key, "n_sessions"]) == row["n_sessions"]
        assert int(got.loc[key, "n_bounces"]) == row["n_bounces"]


def test_theil_sen_matches_numpy_median(spark, sf_dir):
    got = q_theil_sen_slope(spark, sf_dir).toPandas().set_index("supp")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey").alias("supp"),
            F.col("l_partkey").alias("part"),
            (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("key"),
            F.col("l_quantity").cast("double").alias("q"),
            F.col("l_extendedprice").alias("p"),
        )
        .toPandas()
    )
    slopes: dict = {}
    for (supp, _), grp in li.groupby(["supp", "part"]):
        # positional pairs over the query's total order -- (orderkey,
        # linenumber) composites COLLIDE in this testdata, so key-based
        # a<b dedupe would silently drop twin-row pairs
        rows = sorted(grp.itertuples(), key=lambda r: (r.key, r.q, r.p))
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                if a.q != b.q:
                    slopes.setdefault(supp, []).append((b.p - a.p) / (b.q - a.q))
    for supp, ss in slopes.items():
        assert int(got.loc[supp, "n_pairs"]) == len(ss)
        assert math.isclose(
            float(got.loc[supp, "median_slope"]), float(np.median(ss)), abs_tol=1e-5
        )
    assert set(got.index) == set(slopes)


def test_lift_table_is_consistent(spark, sf_dir):
    got = q_lift_gains_table(spark, sf_dir).toPandas().sort_values("decile")
    ev = _events(spark, sf_dir)
    n, n_pos = len(ev), int((ev.event_type == "purchase").sum())
    assert got["n"].sum() == n and got["n_pos"].sum() == n_pos
    assert got["n"].max() - got["n"].min() <= 1
    # cumulative gain is monotone and ends at 1
    assert got["cum_gain"].is_monotonic_increasing
    assert math.isclose(got["cum_gain"].iloc[-1], 1.0, abs_tol=1e-9)
    # lift * overall rate == response rate
    overall = n_pos / n
    for r in got.itertuples():
        assert math.isclose(r.lift * overall, r.response_rate, abs_tol=1e-5)
