"""Definition-level checks for ext114: literal Wilson bounds, the
CSN MLE formula, and a literal debut-degree correlation."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext114 import (
    _WILSON_MIN_N,
    _Z2,
    q_degree_powerlaw_mle,
    q_preferential_attachment_check,
    q_wilson_lower_bound_ranking,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _edges_and_degrees(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).toPandas().drop_duplicates()
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp.l_partkey))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = Counter()
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    return edges, deg


def test_wilson_ranking_definition(spark, sf_dir):
    rows = q_wilson_lower_bound_ranking(spark, sf_dir).collect()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    ).toPandas()
    li["keep"] = (li.l_returnflag != "R").astype(int)
    per = li.groupby("l_partkey").keep.agg(["size", "sum"])
    per = per[per["size"] >= _WILSON_MIN_N]
    scored = []
    for pk, r in per.iterrows():
        n, k = int(r["size"]), int(r["sum"])
        p = k / n
        lb = (
            p
            + _Z2 / (2 * n)
            - math.sqrt(_Z2) * math.sqrt(p * (1 - p) / n + _Z2 / (4 * n * n))
        ) / (1 + _Z2 / n)
        scored.append((pk, n, p, math.floor(1e6 * lb + 0.5)))
    scored.sort(key=lambda t: (-t[3], t[0]))
    assert len(rows) == 10
    for r, (pk, n, p, lb6) in zip(rows, scored[:10]):
        assert r["partkey"] == pk
        assert r["n_lines"] == n
        assert abs(r["raw_keep_rate"] - p) < 1e-6
        assert abs(r["wilson_lower_bound"] - lb6 / 1e6) < 1e-6
        # the lower bound never exceeds the raw rate
        assert r["wilson_lower_bound"] <= r["raw_keep_rate"] + 1e-9


def test_powerlaw_mle_definition(spark, sf_dir):
    row = q_degree_powerlaw_mle(spark, sf_dir).collect()[0]
    _, deg = _edges_and_degrees(spark, sf_dir)
    ks = [k for k in deg.values() if k >= 2]
    n = len(ks)
    slog = sum(math.floor(1e9 * math.log(k / 1.5) + 0.5) for k in ks) / 1e9
    alpha = 1 + n / slog
    assert row["n_nodes_tail"] == n
    assert row["max_degree"] == max(ks)
    assert abs(row["alpha_mle"] - alpha) < 1e-3
    assert abs(row["alpha_se"] - (alpha - 1) / math.sqrt(n)) < 1e-3
    assert row["alpha_mle"] > 1.0


def test_preferential_attachment_definition(spark, sf_dir):
    row = q_preferential_attachment_check(spark, sf_dir).collect()[0]
    _, deg = _edges_and_degrees(spark, sf_dir)
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["day"] = (
        pd.to_datetime(j.o_orderdate) - pd.Timestamp("1970-01-01")
    ).dt.days
    debut = j.groupby("l_partkey").day.min()
    pts = [(deg[p], int(debut[p])) for p in deg if p in debut.index]
    k = np.array([a for a, _ in pts], dtype="float64")
    d0 = np.array([b for _, b in pts], dtype="float64")
    r = np.corrcoef(k, d0)[0, 1]
    assert row["n_parts"] == len(pts)
    assert abs(row["debut_degree_corr"] - r) < 1e-5
    assert (row["verdict"] == "older-parts-richer") == (r < 0)
