"""Definition-level checks for ext101: streaming-SPRT == batch walk,
literal fold means, and a numpy two-regime Chow F."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext101 import (
    _CHOW_BREAK,
    _KFOLDS,
    _SPRT_ALPHA,
    _SPRT_P0,
    _SPRT_P1,
    q_chow_test,
    q_kfold_cv_variance,
    q_streaming_sprt_replay,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_streaming_sprt_matches_batch_walk(spark, sf_dir):
    row = q_streaming_sprt_replay(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select(
        "ts", "event_type"
    ).toPandas()
    ev["dt"] = pd.to_datetime(ev.ts).dt.date
    d = (
        ev.assign(hit=(ev.event_type == "purchase").astype(int))
        .groupby("dt")
        .hit.agg(["size", "sum"])
        .sort_index()
    )
    c1 = math.floor(1e9 * math.log(_SPRT_P1 / _SPRT_P0) + 0.5)
    c2 = math.floor(1e9 * math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) + 0.5)
    bnd = math.floor(1e9 * math.log((1 - _SPRT_ALPHA) / _SPRT_ALPHA) + 0.5)
    llr = 0
    decision, ddate = "continue", None
    for dt, r in d.iterrows():
        llr += int(r["sum"]) * c1 + int(r["size"] - r["sum"]) * c2
        if decision == "continue":
            if llr > bnd:
                decision, ddate = "h1", dt
            elif llr < -bnd:
                decision, ddate = "h0", dt
    assert row["n_days"] == len(d)
    assert row["decision"] == decision
    assert (row["decision_date"] is None) == (ddate is None)
    if ddate is not None:
        assert row["decision_date"] == str(ddate)
    assert abs(row["final_llr"] - llr / 1e9) < 1e-6


def test_kfold_definition(spark, sf_dir):
    row = q_kfold_cv_variance(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).toPandas()
    v = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    folds = np.array(
        [
            int(hashlib.md5(str(k).encode()).hexdigest()[:4], 16) % _KFOLDS
            for k in o.o_orderkey
        ]
    )
    means = np.array(
        [v[folds == f].mean() for f in range(_KFOLDS)], dtype="float64"
    )
    assert row["n_folds"] == _KFOLDS
    assert abs(row["overall_mean_dollars"] - v.mean() / 100) < 0.02
    bv = means.var(ddof=1)
    assert abs(row["between_fold_var_dollars2"] - bv / 1e4) < max(
        1e-2, 1e-3 * bv / 1e4
    )
    assert abs(row["cv_se_dollars"] - np.sqrt(bv / _KFOLDS) / 100) < 0.02


def test_chow_definition(spark, sf_dir):
    row = q_chow_test(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    d = (
        pd.DataFrame({"dt": pd.to_datetime(o.o_orderdate), "y": cents})
        .groupby("dt")["y"]
        .sum()
        .sort_index()
        // 100
    )
    t = np.arange(1, len(d) + 1, dtype="float64")
    y = d.to_numpy().astype("float64")

    def rss(tt, yy):
        b = np.cov(tt, yy, bias=True)[0, 1] / tt.var()
        a = yy.mean() - b * tt.mean()
        return ((yy - a - b * tt) ** 2).sum()

    brk = d.index < pd.Timestamp(_CHOW_BREAK)
    rss_p = rss(t, y)
    rss_1 = rss(t[brk], y[brk])
    rss_2 = rss(t[~brk], y[~brk])
    n = len(y)
    f = ((rss_p - rss_1 - rss_2) / 2) / ((rss_1 + rss_2) / (n - 4))
    assert row["n_days"] == n
    assert abs(row["rss_pooled"] - rss_p) < max(0.5, 1e-6 * rss_p)
    assert abs(row["rss_split"] - (rss_1 + rss_2)) < max(0.5, 1e-6 * rss_p)
    assert abs(row["chow_f"] - f) < max(1e-2, 1e-3 * abs(f))
    assert (row["verdict"] == "break") == (f > 3.0)
    # splitting can never raise RSS
    assert row["rss_split"] <= row["rss_pooled"] + 1e-6
