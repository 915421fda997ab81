"""Definition-level checks for the ext32 batch."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext32 import (
    q_cramer_von_mises,
    q_g_test_independence,
    q_learning_curve,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_cvm_matches_literal_edf_integral(spark, sf_dir):
    got = q_cramer_von_mises(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice").toPandas()
    sub = o[o.o_orderpriority.isin(["1-URGENT", "5-LOW"])].copy()
    sub["v"] = np.round(sub.o_totalprice * 100).astype("int64")
    x = np.sort(sub[sub.o_orderpriority == "1-URGENT"].v.values)
    y = np.sort(sub[sub.o_orderpriority == "5-LOW"].v.values)
    n, m = len(x), len(y)
    pooled = np.sort(np.concatenate([x, y]))
    # literal EDF-difference integral over every pooled observation
    fx = np.searchsorted(x, pooled, side="right") / n
    fy = np.searchsorted(y, pooled, side="right") / m
    t = (n * m) / (n + m) ** 2 * float(((fx - fy) ** 2).sum())
    assert (int(got.n_urgent), int(got.n_low)) == (n, m)
    assert math.isclose(float(got.cvm_t), t, abs_tol=1e-5)
    assert float(got.cvm_t) >= 0


def test_g_test_matches_literal_and_tracks_chi2(spark, sf_dir):
    got = q_g_test_independence(spark, sf_dir).toPandas().iloc[0]
    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").toPandas()
    obs = li.groupby(["l_returnflag", "l_linestatus"]).size()
    n = int(obs.sum())
    rows = obs.groupby(level=0).sum()
    cols = obs.groupby(level=1).sum()
    g = 0.0
    for (r, s), o in obs.items():
        e = rows[r] * cols[s] / n
        g += 2 * o * math.log(o / e)
    assert int(got.n_cells) == len(obs)
    assert int(got.dof) == (len(rows) - 1) * (len(cols) - 1)
    assert math.isclose(int(got.g_e9) / 1e9, g, abs_tol=1e-5)


def test_learning_curve_matches_literal_fit(spark, sf_dir):
    got = q_learning_curve(spark, sf_dir).toPandas().set_index("train_buckets")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").toPandas()
    r = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    r["q"] = r.l_quantity.astype("int64")
    r["bkt"] = [
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 16 for u in r.o_custkey
    ]
    ev = r[r.bkt == 15]
    assert len(ev) > 0
    for k in (4, 8, 12, 15):
        tr = r[r.bkt < k]
        mu = (1000000 * int(tr.q.sum())) // len(tr)
        bi: dict = defaultdict(lambda: [0, 0])
        for q, i in zip(tr.q, tr.l_partkey):
            bi[i][0] += 1000000 * int(q) - mu
            bi[i][1] += 1
        bi = {i: v[0] // v[1] for i, v in bi.items()}
        mae = (
            sum(
                abs(1000000 * int(q) - (mu + bi.get(i, 0)))
                for q, i in zip(ev.q, ev.l_partkey)
            )
            // len(ev)
        )
        row = got.loc[k]
        assert int(row.n_train_rows) == len(tr)
        assert int(row.mae_e6) == mae
    # nesting: training rows strictly grow along the curve
    assert list(got.n_train_rows) == sorted(got.n_train_rows)
