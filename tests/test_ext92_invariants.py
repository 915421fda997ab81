"""Definition-level checks for ext92: literal DeLong placements,
direct Brier + Murphy identity, and literal HL terms."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext92 import (
    _TEST_DAYS,
    q_auc_delong_ci,
    q_brier_decomposition,
    q_hosmer_lemeshow,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_delong_definition(spark, sf_dir):
    row = q_auc_delong_ci(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).toPandas()
    v = np.floor(ev.value.to_numpy() * 100 + 0.5).astype("int64")
    y = (ev.event_type == "purchase").to_numpy()
    pos, neg = np.sort(v[y]), np.sort(v[~y])
    n1, n0 = len(pos), len(neg)
    assert row["n_pos"] == n1 and row["n_neg"] == n0
    # literal placement values
    lt = np.searchsorted(neg, pos, side="left")
    le = np.searchsorted(neg, pos, side="right")
    v10 = (lt + (le - lt) / 2.0) / n0
    gt = n1 - np.searchsorted(pos, neg, side="right")
    ge = n1 - np.searchsorted(pos, neg, side="left")
    v01 = (gt + (ge - gt) / 2.0) / n1
    auc = v10.mean()
    assert abs(v01.mean() - auc) < 1e-12  # the DeLong identity
    se = np.sqrt(v10.var(ddof=1) / n1 + v01.var(ddof=1) / n0)
    assert abs(row["auc"] - auc) < 1e-6
    assert abs(row["delong_se"] - se) < 1e-5
    assert abs(row["ci_low"] - (auc - 1.96 * se)) < 1e-4
    assert abs(row["ci_high"] - (auc + 1.96 * se)) < 1e-4


def _dow_counts(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_orderpriority"
    ).toPandas()
    o["dt"] = pd.to_datetime(o.o_orderdate)
    o["dow"] = o.dt.dt.dayofweek
    o["y"] = (o.o_orderpriority == "1-URGENT").astype(int)
    cutoff = o.dt.max() - pd.Timedelta(days=_TEST_DAYS)
    train = o[o.dt <= cutoff].groupby("dow").y.agg(["size", "sum"])
    test = o[o.dt > cutoff].groupby("dow").y.agg(["size", "sum"])
    return train, test


def test_brier_definition(spark, sf_dir):
    row = q_brier_decomposition(spark, sf_dir).collect()[0]
    train, test = _dow_counts(spark, sf_dir)
    ntot = int(test["size"].sum())
    ktot = int(test["sum"].sum())
    assert row["n_test"] == ntot
    brier = rel = res = 0.0
    gbar = ktot / ntot
    for dow in test.index:
        nt, kt = int(test.loc[dow, "size"]), int(test.loc[dow, "sum"])
        n, k = int(train.loc[dow, "size"]), int(train.loc[dow, "sum"])
        p = k / n
        obar = kt / nt
        brier += nt * p * p - 2 * p * kt + kt
        rel += nt * (p - obar) ** 2
        res += nt * (obar - gbar) ** 2
    assert abs(row["brier"] - brier / ntot) < 1e-5
    assert abs(row["reliability"] - rel / ntot) < 1e-5
    assert abs(row["resolution"] - res / ntot) < 1e-5
    assert abs(row["uncertainty"] - gbar * (1 - gbar)) < 1e-6
    # Murphy identity
    assert abs(
        row["brier"] - (row["reliability"] - row["resolution"] + row["uncertainty"])
    ) < 5e-6


def test_hosmer_lemeshow_definition(spark, sf_dir):
    row = q_hosmer_lemeshow(spark, sf_dir).collect()[0]
    train, test = _dow_counts(spark, sf_dir)
    hl = 0.0
    bins = 0
    for dow in test.index:
        n, k = int(train.loc[dow, "size"]), int(train.loc[dow, "sum"])
        if not (0 < k < n):
            continue
        nt, kt = int(test.loc[dow, "size"]), int(test.loc[dow, "sum"])
        p = k / n
        hl += (kt - nt * p) ** 2 / (nt * p * (1 - p))
        bins += 1
    assert row["n_bins"] == bins
    assert row["dof"] == bins - 2
    assert abs(row["hl_stat"] - hl) < 1e-3
    assert row["hl_stat"] >= 0.0
