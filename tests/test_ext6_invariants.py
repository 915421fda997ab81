"""Definition-level checks for the ext6 batch. The oracle gate proves
cross-engine equality; these tests prove the answers satisfy the
DEFINITIONS (CMS never underestimates, the grid join finds exactly the
brute-force pair set, label propagation converges toward component
minima, ACF is a correlation), so a shared-formulation bug can't slip
through both gates.
"""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext6 import (
    q_autocorr_daily_revenue,
    q_benford_digit_audit,
    q_grid_neighbor_pairs,
    q_heavy_hitters_cms,
    q_label_propagation,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_benford_digits_partition_counts(spark, sf_dir):
    got = q_benford_digit_audit(spark, sf_dir).toPandas()
    assert set(got["digit"]) <= set(range(1, 10))
    # observed counts per priority must sum to that priority's n_total,
    # and n_total must equal the raw order count per priority
    per = got.groupby("priority").agg(obs=("observed", "sum"), n=("n_total", "first"))
    assert (per["obs"] == per["n"]).all()
    orders = read_table(spark, sf_dir, "orders").groupBy("o_orderpriority").count()
    raw = {r["o_orderpriority"]: r["count"] for r in orders.collect()}
    assert {p: int(n) for p, n in per["n"].items()} == raw
    # Benford probabilities over d=1..9 sum to 1, so expected sums to ~n
    per_exp = got.groupby("priority")["expected"].sum()
    for p, e in per_exp.items():
        assert math.isclose(e, raw[p], rel_tol=1e-6)


def test_cms_never_underestimates(spark, sf_dir):
    got = q_heavy_hitters_cms(spark, sf_dir).toPandas()
    assert len(got) > 0
    assert (got["est_cnt"] >= got["exact_cnt"]).all(), "CMS must overestimate"
    # the sketch is 4x256 on a small key domain: the top estimate should
    # still be within a loose factor of the true heavy hitter
    assert got["est_cnt"].iloc[0] <= got["exact_cnt"].max() * 10


def test_grid_join_equals_brute_force(spark, sf_dir):
    got = q_grid_neighbor_pairs(spark, sf_dir).toPandas()
    pts = {
        r["vec_id"]: (float(r["x"]), float(r["y"]))
        for r in read_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.element_at("embedding", 1).cast("double").alias("x"),
            F.element_at("embedding", 2).cast("double").alias("y"),
        )
        .collect()
    }
    brute = set()
    for a, b in itertools.combinations(sorted(pts), 2):
        (xa, ya), (xb, yb) = pts[a], pts[b]
        if (xa - xb) ** 2 + (ya - yb) ** 2 < 0.05 * 0.05:
            brute.add((a, b))
    assert set(zip(got["id_a"], got["id_b"])) == brute
    assert (got["dist"] < 0.05).all()


def test_label_propagation_monotone_toward_components(spark, sf_dir):
    got = q_label_propagation(spark, sf_dir).toPandas()
    assert (got["lbl"] <= got["node"]).all(), "min-label can only decrease"
    nodes = set(got["node"])
    assert set(got["lbl"]) <= nodes, "labels must be node ids"
    assert len(got) == len(nodes), "one row per node"
    # recompute true components with a python union-find; after 3 sync
    # rounds every label must still be >= its true component minimum
    li = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") < 200)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order: dict = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], []).append(r["l_partkey"])
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for parts in by_order.values():
        for p in parts[1:]:
            parent[find(parts[0])] = find(p)
    comp_min: dict = {}
    for n in nodes:
        root = find(n)
        comp_min[root] = min(comp_min.get(root, n), n)
    for n, l in zip(got["node"], got["lbl"]):
        assert l >= comp_min[find(n)], "label dropped below component minimum"


def test_autocorr_is_a_correlation(spark, sf_dir):
    got = q_autocorr_daily_revenue(spark, sf_dir).toPandas().sort_values("lag_k")
    assert list(got["lag_k"]) == list(range(1, 8))
    assert (got["acf"].abs() <= 1.0).all()
    # n shrinks by exactly one pair per extra lag step
    ns = list(got["n"])
    assert all(ns[i] - ns[i + 1] == 1 for i in range(6))
    # cross-check lag-1 against pandas' exact correlation on the series
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents"))
        .orderBy("o_orderdate")
        .toPandas()
    )
    s = daily["cents"].astype(float)
    expected = s.autocorr(lag=1) if len(s) > 2 else None
    # pandas autocorr uses the same sample-Pearson-of-shifted-series
    # definition; allow float slack (we computed from exact integers)
    assert expected == pytest.approx(float(got["acf"].iloc[0]), abs=1e-6)
