"""Definition-level checks for the ext33 batch."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext33 import (
    q_capture_recapture,
    q_permutation_sign_test,
    q_raking_weights,
    q_stratified_ate,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _cents(p: pd.Series) -> pd.Series:
    return np.round(p * 100).astype("int64")


def test_stratified_ate_matches_literal_strata(spark, sf_dir):
    got = q_stratified_ate(spark, sf_dir).toPandas().set_index("stratum")
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    ).toPandas()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["t"] = df.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(int)
    df["y"] = _cents(df.o_totalprice)
    keep = df.groupby("c_mktsegment").t.agg(["sum", "size"])
    keep = keep[(keep["sum"] > 0) & (keep["sum"] < keep["size"])]
    n_total = int(keep["size"].sum())
    ate = 0.0
    for seg in keep.index:
        g = df[df.c_mktsegment == seg]
        mt = g[g.t == 1].y.mean()
        mc = g[g.t == 0].y.mean()
        row = got.loc[seg]
        assert int(row.n_t) == int(g.t.sum())
        assert abs(int(row.diff_e3) - 1000 * (mt - mc)) < 2
        term = 1000 * (len(g) / n_total) * (mt - mc)
        assert abs(int(row.ate_term_e3) - term) < 2
        ate += term / 1000
    # the weighted terms reassemble the full stratified estimator
    assert math.isclose(got.ate_term_e3.sum() / 1000, ate, abs_tol=0.01)


def test_raking_converges_toward_margins(spark, sf_dir):
    got = q_raking_weights(spark, sf_dir).toPandas()
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    ).toPandas()
    pop_col = cust.groupby("c_mktsegment").size()
    # after the final column adjustment the column margins must match
    # the population targets almost exactly (e6 rounding noise only)
    colsum = got.groupby("seg").weight_e6.sum()
    for seg, target in pop_col.items():
        assert abs(int(colsum[seg]) - 1000000 * int(target)) <= 1000
    # literal IPF replay: same trajectory, same e6 rounding
    samp = cust[cust.c_custkey % 2 == 0]
    w = {
        (nk, seg): 1000000 * n
        for (nk, seg), n in samp.groupby(["c_nationkey", "c_mktsegment"]).size().items()
    }
    pop_row = cust.groupby("c_nationkey").size()

    def adjust(w, margin, key_idx, targets):
        cur = defaultdict(int)
        for k, v in w.items():
            cur[k[key_idx]] += v
        out = {}
        for k, v in w.items():
            t = int(targets[k[key_idx]])
            out[k] = round(float(v) * t * 1000000 / float(cur[k[key_idx]]))
        return out

    for _ in range(2):
        w = adjust(w, "row", 0, pop_row)
        w = adjust(w, "col", 1, pop_col)
    have = {(r.nk, r.seg): int(r.weight_e6) for r in got.itertuples()}
    assert have == w


def test_permutation_sign_test_matches_literal_replicates(spark, sf_dir):
    got = q_permutation_sign_test(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = _cents(o.o_totalprice)
    days = o.groupby("o_orderdate").c.sum().sort_index().values
    deltas = [(i + 1, int(b) - int(a)) for i, (a, b) in enumerate(zip(days, days[364:]))]
    t_obs = sum(d for _, d in deltas)
    extreme = 0
    for b in range(100):
        t = sum(
            (1 if ((b * 104729 + i * 999983 + 12289) % 2147483647) % 2 == 0 else -1) * d
            for i, d in deltas
        )
        if abs(t) >= abs(t_obs):
            extreme += 1
    assert int(got.n_pairs) == len(deltas)
    assert int(got.t_obs) == t_obs
    assert int(got.n_extreme) == extreme
    assert int(got.p_value_ppm) == (1000000 * (1 + extreme)) // 101


def test_capture_recapture_matches_literal_lists(spark, sf_dir):
    got = q_capture_recapture(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate").toPandas()
    y = o.o_orderdate.dt.year
    l1 = set(o[y == 1996].o_custkey)
    l2 = set(o[y == 1997].o_custkey)
    n1, n2, m = len(l1), len(l2), len(l1 & l2)
    assert (int(got.n1), int(got.n2), int(got.m)) == (n1, n2, m)
    if m:
        assert int(got.lincoln_petersen) == (n1 * n2) // m
    assert int(got.chapman) == ((n1 + 1) * (n2 + 1)) // (m + 1) - 1
    # estimators bound below by what was actually observed
    assert int(got.chapman) >= len(l1 | l2) - 1
