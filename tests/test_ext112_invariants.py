"""Definition-level checks for ext112: a literal python median
polish, hierarchical R^2 re-derivation, and per-scale dispersion."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext112 import (
    q_calendar_variance_decomposition,
    q_dispersion_scale_sweep,
    q_median_polish_2way,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_median_polish_definition(spark, sf_dir):
    rows = q_median_polish_2way(spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    ).toPandas()
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["v"] = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    cells = {}
    for (g, s), grp in j.groupby(["c_nationkey", "c_mktsegment"]):
        cells[(g, s)] = _lower_median(grp.v.tolist())
    for part in ("g", "s", "g", "s"):
        idx = 0 if part == "g" else 1
        meds = {}
        groups = {}
        for key, v in cells.items():
            groups.setdefault(key[idx], []).append(v)
        for k, vs in groups.items():
            meds[k] = _lower_median(vs)
        cells = {key: v - meds[key[idx]] for key, v in cells.items()}
    scored = sorted(
        cells.items(), key=lambda kv: (-abs(kv[1]), kv[0][0], kv[0][1])
    )[:5]
    assert len(rows) == 5
    for r, ((g, s), v) in zip(rows, scored):
        assert r["nationkey"] == g
        assert r["segment"] == s
        assert abs(r["residual_dollars"] - v / 100) < 0.011


def test_calendar_r2_definition(spark, sf_dir):
    row = q_calendar_variance_decomposition(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    d = (
        pd.DataFrame({"dt": pd.to_datetime(o.o_orderdate), "c": cents})
        .groupby("dt")["c"]
        .sum()
        // 100
    ).reset_index(name="y")
    d["dow"] = d.dt.dt.dayofweek
    d["mth"] = d.dt.dt.month
    y = d.y.to_numpy().astype("float64")
    sst = ((y - y.mean()) ** 2).sum()
    ssd = sum(
        len(g) * (g.y.mean() - y.mean()) ** 2 for _, g in d.groupby("dow")
    )
    ssc = sum(
        len(g) * (g.y.mean() - y.mean()) ** 2
        for _, g in d.groupby(["dow", "mth"])
    )
    assert row["n_days"] == len(d)
    assert abs(row["r2_weekday"] - ssd / sst) < 1e-4
    assert abs(row["r2_weekday_month"] - ssc / sst) < 1e-4
    assert abs(row["r2_month_increment"] - (ssc - ssd) / sst) < 1e-4
    # nesting: finer cells can only explain more
    assert row["r2_weekday_month"] >= row["r2_weekday"] - 1e-9


def test_dispersion_sweep_definition(spark, sf_dir):
    rows = {r["window_days"]: r for r in q_dispersion_scale_sweep(spark, sf_dir).collect()}
    o = read_table(spark, sf_dir, "orders").select("o_orderdate").toPandas()
    d = pd.to_datetime(o.o_orderdate)
    daily = d.value_counts().sort_index()
    d0 = daily.index.min()
    assert sorted(rows) == [1, 7, 28]
    for w in (1, 7, 28):
        bins = {}
        for dt, c in daily.items():
            b = (dt - d0).days // w
            bins[b] = bins.get(b, 0) + int(c)
        x = np.array(list(bins.values()), dtype="float64")
        di = x.var(ddof=0) / x.mean()
        r = rows[w]
        assert r["n_windows"] == len(x)
        assert abs(r["mean_per_window"] - x.mean()) < 0.05
        assert abs(r["dispersion_index"] - di) < 1e-3
