"""Independent re-derivations for the feature/time-series queries whose
DuckDB oracles share the Spark formulation (EWMA prefix-sum rewrite,
TWAP, spine-rank Spearman, BFS unroll): a bug in the shared rewrite
would pass the cross-engine hash gate, so these tests recompute the
answers from the DEFINITIONS -- iterative recursion in pandas, pandas'
own spearman, a plain python BFS -- and compare."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext5 import (
    q_khop_reachability,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_feat import (
    q_ewma_smoothing,
    q_markov_transitions,
    q_spearman_corr,
    q_twap,
    q_weighted_sample_topk,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_ewma_matches_iterative_recursion(spark, sf_dir):
    got = q_ewma_smoothing(spark, sf_dir).toPandas()
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    # the definition: ewma_t = 0.2*x_t + 0.8*ewma_{t-1}, seeded at x_1
    expected = {}
    for uid, grp in ev.groupby("user_id"):
        state = None
        for _, row in grp.iterrows():
            state = row.value if state is None else 0.2 * row.value + 0.8 * state
            expected[(uid, row.event_id)] = state
    assert len(got) == len(expected)
    for r in got.itertuples():
        assert math.isclose(
            r.ewma, round(expected[(r.user_id, r.event_id)], 6), abs_tol=2e-6
        ), (r.user_id, r.event_id)


def test_spearman_matches_pandas(spark, sf_dir):
    got = q_spearman_corr(spark, sf_dir).collect()[0]
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .toPandas()
    )
    # rank(average) + Pearson == Spearman; avoids the scipy dependency
    rho = (
        li["l_quantity"].rank(method="average")
        .corr(li["l_extendedprice"].rank(method="average"))
    )
    assert abs(got["spearman_rho"] - rho) < 1e-5
    assert got["n"] == len(li)


def test_twap_matches_pandas(spark, sf_dir):
    got = {r.user_id: r for r in q_twap(spark, sf_dir).collect()}
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "event_id"])
    )
    for uid, grp in ev.groupby("user_id"):
        if len(grp) < 2:
            assert uid not in got
            continue
        t = grp.ts.astype("int64") // 1000  # ns -> us
        dur = t.diff().shift(-1).dropna()
        vals = grp.value.iloc[:-1]
        twap = (vals.values * dur.values).sum() / dur.values.sum()
        assert math.isclose(got[uid].twap, round(twap, 6), abs_tol=2e-6), uid
        assert got[uid].total_dur_us == int(dur.sum())


def test_khop_distances_match_python_bfs(spark, sf_dir):
    got = {r.node: r.dist for r in q_khop_reachability(spark, sf_dir).collect()}
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    adj: dict[int, set[int]] = {}
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp.l_partkey))
        for a in parts:
            for b in parts:
                if a != b:
                    adj.setdefault(a, set()).add(b)
    seeds = {p for p in adj if p < 5}
    dist = {p: 0 for p in seeds}
    frontier = set(seeds)
    for d in (1, 2):
        nxt = set()
        for p in frontier:
            for q in adj.get(p, ()):
                if q not in dist:
                    nxt.add(q)
        for q in nxt:
            dist[q] = d
        frontier = nxt
    assert got == dist


def test_markov_rows_are_distributions(spark, sf_dir):
    pdf = q_markov_transitions(spark, sf_dir).toPandas()
    sums = pdf.groupby("cur")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()
    assert (pdf["p"] > 0).all()


def test_weighted_sample_matches_python_aes(spark, sf_dir):
    got = [(r.doc_id, r.rk) for r in q_weighted_sample_topk(spark, sf_dir).collect()]
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars").toPandas()
    keys = []
    for r in docs.itertuples():
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8]
        u = (int(h, 16) + 1.0) / 4294967297.0
        keys.append((-math.log(u) / r.n_chars, r.doc_id))
    keys.sort()
    expected = [(doc, i + 1) for i, (_, doc) in enumerate(keys[:20])]
    assert sorted(got, key=lambda x: x[1]) == expected
