"""Definition-level checks for the ext11 batch. Weighted median and
apportionment get literal python sweeps (their oracles share the
formulation); FD checks get a pandas nunique recompute; rolling
correlation gets pandas.rolling.corr; session paths get a literal
session replay.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext11 import (
    q_functional_dependency_check,
    q_largest_remainder_allocation,
    q_rolling_correlation,
    q_session_path_topk,
    q_weighted_median,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_apportionment_sums_to_units_and_is_hamilton(spark, sf_dir):
    got = q_largest_remainder_allocation(spark, sf_dir).toPandas()
    assert got["allocated"].sum() == 10000
    total = got["cents"].sum()
    # Hamilton: every nation gets floor(quota) or floor(quota)+1, and
    # the +1s go to the largest remainders
    got["base"] = (10000 * got["cents"]) // total
    got["rem"] = (10000 * got["cents"]) % total
    assert ((got["allocated"] - got["base"]).isin([0, 1])).all()
    leftover = 10000 - got["base"].sum()
    bonus = got[got["allocated"] == got["base"] + 1]
    assert len(bonus) == leftover
    if leftover and len(bonus) < len(got):
        min_bonus_rem = bonus["rem"].min()
        max_nonbonus_rem = got[got["allocated"] == got["base"]]["rem"].max()
        assert min_bonus_rem >= max_nonbonus_rem


def test_fd_checks_match_pandas_nunique(spark, sf_dir):
    got = q_functional_dependency_check(spark, sf_dir).toPandas().set_index("fd")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_returnflag"
    ).toPandas()
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority").toPandas()
    cases = {
        "l_partkey->l_suppkey": li.groupby("l_partkey")["l_suppkey"].nunique(),
        "o_custkey->o_orderpriority": orders.groupby("o_custkey")["o_orderpriority"].nunique(),
        "l_orderkey->l_returnflag": li.groupby("l_orderkey")["l_returnflag"].nunique(),
    }
    for fd, nd in cases.items():
        assert int(got.loc[fd, "n_keys"]) == len(nd)
        assert int(got.loc[fd, "n_violating_keys"]) == int((nd > 1).sum())
        assert int(got.loc[fd, "max_rhs_per_key"]) == int(nd.max())
        assert got.loc[fd, "holds"] == str(nd.max() == 1).lower()
    # the customer-key FD must hold (c_custkey is unique)
    assert got.loc["c_custkey->c_nationkey", "holds"] == "true"
    assert int(got.loc["c_custkey->c_nationkey", "n_violating_keys"]) == 0


def test_rolling_corr_matches_pandas(spark, sf_dir):
    got = q_rolling_correlation(spark, sf_dir).toPandas().set_index("day")
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("x"),
            F.count(F.lit(1)).alias("y"),
        )
        .orderBy("d")
        .toPandas()
    )
    r = daily["x"].rolling(15).corr(daily["y"].astype(float))
    for i in range(14, len(daily)):
        day = pd.Timestamp(daily["d"].iloc[i]).strftime("%Y-%m-%d")
        assert math.isclose(float(got.loc[day, "r"]), float(r.iloc[i]), abs_tol=1e-5)
    assert len(got) == len(daily) - 14


def test_session_paths_match_replay(spark, sf_dir):
    got = q_session_path_topk(spark, sf_dir).toPandas()
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    from collections import Counter

    paths: Counter = Counter()
    for _, grp in ev.groupby("user_id"):
        sess, last = [], None
        for r in grp.itertuples():
            if last is None or (r.ts - last).total_seconds() > 7200:
                sess.append([])
            sess[-1].append(r.event_type)
            last = r.ts
        for s in sess:
            paths.update(">".join(s[i : i + 3]) for i in range(len(s) - 2))
    total = sum(paths.values())
    expected = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["path"], got["n"])) == expected
    for r in got.itertuples():
        assert math.isclose(r.share, paths[r.path] / total, abs_tol=1e-6)


def test_weighted_median_matches_python_sweep(spark, sf_dir):
    got = q_weighted_median(spark, sf_dir).toPandas().set_index("rf")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("rf"),
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0)
            .cast("long")
            .alias("uc"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .toPandas()
    )
    for rf, grp in li.groupby("rf"):
        tw = grp["w"].sum()
        cw = 0
        med = None
        for uc, w in sorted(grp.groupby("uc")["w"].sum().items()):
            cw += w
            if 2 * cw >= tw:
                med = uc
                break
        assert int(got.loc[rf, "total_weight"]) == tw
        assert math.isclose(float(got.loc[rf, "weighted_median_price"]), med / 100.0, abs_tol=1e-9)
        # definitional property of the lower weighted median: strictly
        # under half the weight lies below it, at least half lies at or
        # below it
        below = grp[grp["uc"] < med]["w"].sum()
        at_or_below = below + grp[grp["uc"] == med]["w"].sum()
        assert 2 * below < tw
        assert 2 * at_or_below >= tw
