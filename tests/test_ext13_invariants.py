"""Definition-level checks for the ext13 batch: literal replays for
the union-window anti-range-join and the Bellman-Ford unroll, pandas
recomputes for contracts, RLE runs, and the three means.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext13 import (
    q_contract_violations,
    q_generalized_means,
    q_min_plus_shortest_paths,
    q_purchase_without_view,
    q_rle_compressibility,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_orphan_purchases_match_literal_scan(spark, sf_dir):
    got = q_purchase_without_view(spark, sf_dir).toPandas()
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .toPandas()
    )
    views = ev[ev.event_type == "view"]
    orphans = set()
    for r in ev[ev.event_type == "purchase"].itertuples():
        uv = views[views.user_id == r.user_id]
        prior = uv[(uv.ts <= r.ts) & ((r.ts - uv.ts).dt.total_seconds() <= 3600)]
        if prior.empty:
            orphans.add(r.event_id)
    assert set(got["event_id"]) == orphans


def test_contract_counts_match_pandas(spark, sf_dir):
    got = q_contract_violations(spark, sf_dir).toPandas().set_index("rule")
    orders = read_table(spark, sf_dir, "orders").toPandas()
    li = read_table(spark, sf_dir, "lineitem").toPandas()
    ev = read_table(spark, sf_dir, "events").toPandas()
    assert int(got.loc["orders.totalprice > 0", "n_violations"]) == int(
        (~(orders.o_totalprice > 0)).sum()
    )
    assert int(got.loc["orders.status in enum", "n_violations"]) == int(
        (~orders.o_orderstatus.isin(["F", "O", "P"])).sum()
    )
    assert int(got.loc["lineitem.quantity in [1,50]", "n_violations"]) == int(
        (~((li.l_quantity >= 1) & (li.l_quantity <= 50))).sum()
    )
    assert int(got.loc["events.props is object", "n_violations"]) == int(
        (~ev.props.str.match(r"^\{.*\}$")).sum()
    )
    assert (got["n_checked"] > 0).all()


def test_rle_runs_match_pandas(spark, sf_dir):
    got = q_rle_compressibility(spark, sf_dir).toPandas().set_index("col")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.date_format("l_shipdate", "yyyy-MM").alias("shipmonth"),
            (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("k"),
            "l_quantity",
            "l_extendedprice",
        )
        .toPandas()
        .sort_values(["k", "l_quantity", "l_extendedprice"])
    )
    for col, name in [("l_returnflag", "l_returnflag"), ("l_linestatus", "l_linestatus"), ("shipmonth", "shipmonth")]:
        runs = int((li[col] != li[col].shift()).sum())
        assert int(got.loc[name, "n_runs"]) == runs
        assert int(got.loc[name, "n_rows"]) == len(li)


def test_means_are_ordered_and_match_python(spark, sf_dir):
    got = q_generalized_means(spark, sf_dir).toPandas().iloc[0]
    prices = read_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()["o_totalprice"]
    am = prices.mean()
    gm = math.exp(pd.Series([math.log(x) for x in prices]).mean())
    hm = len(prices) / sum(1.0 / x for x in prices)
    # AM >= GM >= HM always (all prices positive)
    assert float(got.arithmetic_mean) >= float(got.geometric_mean) >= float(got.harmonic_mean)
    assert math.isclose(float(got.arithmetic_mean), am, rel_tol=1e-6)
    assert math.isclose(float(got.geometric_mean), gm, rel_tol=1e-5)
    assert math.isclose(float(got.harmonic_mean), hm, rel_tol=1e-5)


def test_min_plus_matches_python_bellman_ford(spark, sf_dir):
    got = q_min_plus_shortest_paths(spark, sf_dir).toPandas()
    li = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") < 300)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    from collections import Counter, defaultdict

    cnt: Counter = Counter()
    for _, grp in li.groupby("l_orderkey"):
        ps = list(grp["l_partkey"])
        for x in ps:
            for y in ps:
                if x != y:
                    cnt[(x, y)] += 1
    dist = {x: 0 for x in {x for (x, _) in cnt} if x < 5}
    for _ in range(3):  # the literal 3-round relaxation
        nxt = dict(dist)
        for (x, y), c in cnt.items():
            w = max(1, 10 - c)
            if x in dist and dist[x] + w < nxt.get(y, float("inf")):
                nxt[y] = dist[x] + w
        dist = nxt
    assert dict(zip(got["node"], got["dist"])) == dist
