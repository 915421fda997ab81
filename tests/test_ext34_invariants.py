"""Definition-level checks for the ext34 batch."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext34 import (
    q_decision_stump_split,
    q_hill_tail_index,
    q_rate_test_exposure,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _cents(p: pd.Series) -> pd.Series:
    return np.round(p * 100).astype("int64")


def test_decision_stump_is_the_true_argmin(spark, sf_dir):
    got = q_decision_stump_split(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag").toPandas()
    bad = set(li[li.l_returnflag == "R"].l_orderkey)
    o["y"] = o.o_orderkey.isin(bad).astype(int)
    o["v"] = _cents(o.o_totalprice)
    sp = o.groupby("v").y.agg(["size", "sum"]).sort_index()
    n, kk = int(sp["size"].sum()), int(sp["sum"].sum())
    nl = kl = 0
    best = None
    for v, row in sp.iterrows():
        nl += int(row["size"])
        kl += int(row["sum"])
        if nl >= n:
            break
        nr, kr = n - nl, kk - kl
        g = (nl / n) * (1 - (kl / nl) ** 2 - ((nl - kl) / nl) ** 2) + (nr / n) * (
            1 - (kr / nr) ** 2 - ((nr - kr) / nr) ** 2
        )
        key = (round(1e12 * g), v)
        if best is None or key < best[0]:
            best = (key, v, nl, kl, nr, kr)
    _, v, nl, kl, nr, kr = best
    assert int(got.split_cents) == v
    assert (int(got.n_left), int(got.k_left), int(got.n_right), int(got.k_right)) == (
        nl,
        kl,
        nr,
        kr,
    )
    assert int(got.gini_e12) == best[0][0]
    # the chosen split must beat (or tie) the unsplit Gini
    g0 = 1 - (kk / n) ** 2 - ((n - kk) / n) ** 2
    assert int(got.gini_e12) <= round(1e12 * g0)


def test_hill_matches_literal_order_statistics(spark, sf_dir):
    got = q_hill_tail_index(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").toPandas()
    o["v"] = _cents(o.o_totalprice)
    top = o.sort_values(["v", "o_orderkey"], ascending=[False, True]).head(101)
    vals = top.v.values
    x_ref = int(vals[100])
    terms = [round(1e8 * math.log(int(v) / x_ref)) for v in vals[:100]]
    assert int(got.x_ref_cents) == x_ref
    assert int(got.hill_e8) == sum(terms) // 100
    assert math.isclose(float(got.alpha_hat), 100 * 1e8 / sum(terms), abs_tol=1e-5)
    assert float(got.alpha_hat) > 0


def test_rate_test_matches_literal_exposure(spark, sf_dir):
    got = q_rate_test_exposure(spark, sf_dir).toPandas().iloc[0]
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts").toPandas()
    ev["t"] = ev.ts.astype("int64") // 1000
    agg = ev.groupby("user_id").agg(
        span=("t", lambda s: int(s.max() - s.min())),
        k=("event_type", lambda s: int((s == "purchase").sum())),
    )
    agg = agg[agg.span > 0]
    arms = {}
    for variant in (0, 1):
        g = agg[agg.index % 2 == variant]
        arms[variant] = (int(g.k.sum()), int(g.span.sum()))
    (k_a, t_a), (k_b, t_b) = arms[0], arms[1]
    assert (int(got.k_a), int(got.t_a), int(got.k_b), int(got.t_b)) == (k_a, t_a, k_b, t_b)
    ra, rb = 1e12 * k_a / t_a, 1e12 * k_b / t_b
    z = (ra - rb) / math.sqrt(1e24 * k_a / t_a**2 + 1e24 * k_b / t_b**2)
    assert math.isclose(float(got.z_score), z, abs_tol=1e-4)
