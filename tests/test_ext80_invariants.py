"""Definition-level checks for ext80: literal pandas re-derivations of
the newsvendor quantile, safety stock / ROP, and the SG smoother."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext80 import (
    _NV_RATIO_PCT,
    _SG_M,
    _SS_Z_E3,
    _TOP_PARTS,
    q_newsvendor_quantile,
    q_safety_stock_reorder,
    q_savgol_spike_days,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _demand(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).toPandas()
    li["q"] = li.l_quantity.astype("int64")
    return (
        li.groupby(["l_partkey", "l_shipdate"], as_index=False)["q"].sum()
    )


def test_newsvendor_definition(spark, sf_dir):
    rows = q_newsvendor_quantile(spark, sf_dir).collect()
    dem = _demand(spark, sf_dir)
    totals = dem.groupby("l_partkey")["q"].sum()
    top = sorted(
        totals.index, key=lambda pk: (-totals[pk], pk)
    )[:_TOP_PARTS]
    assert sorted(r["partkey"] for r in rows) == sorted(top)
    for r in rows:
        s = np.sort(dem[dem.l_partkey == r["partkey"]].q.to_numpy())
        n = len(s)
        assert r["n_demand_days"] == n
        assert abs(r["mean_daily_units"] - s.mean()) < 1e-3
        cc = np.arange(1, n + 1)
        qstar = int(s[np.argmax(100 * cc >= _NV_RATIO_PCT * n)])
        assert r["q_star_units"] == qstar
        # the critical-ratio quantile is never below the mean-centered
        # median for a right-skew guard: weak sanity, q* >= median
        med = int(s[np.argmax(100 * cc >= 50 * n)])
        assert qstar >= med


def test_safety_stock_definition(spark, sf_dir):
    rows = q_safety_stock_reorder(spark, sf_dir).collect()
    dem = _demand(spark, sf_dir)
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["lead"] = (
        (pd.to_datetime(j.l_shipdate) - pd.to_datetime(j.o_orderdate)).dt.days
    ).clip(lower=0)
    assert len(rows) == _TOP_PARTS
    for r in rows:
        s = dem[dem.l_partkey == r["partkey"]].q.to_numpy().astype("float64")
        mu, sd = s.mean(), s.std(ddof=0)
        lt = j[j.l_partkey == r["partkey"]].lead.mean()
        z = _SS_Z_E3 / 1000.0
        ss = z * sd * np.sqrt(lt)
        assert abs(r["mean_daily_units"] - mu) < 1e-3
        assert abs(r["sd_daily_units"] - sd) < 1e-3
        assert abs(r["avg_lead_days"] - lt) < 1e-3
        assert abs(r["safety_stock_units"] - ss) < 1e-2
        assert abs(r["reorder_point_units"] - (mu * lt + ss)) < 1e-2
        assert r["reorder_point_units"] >= r["safety_stock_units"]


def test_savgol_definition(spark, sf_dir):
    rows = q_savgol_spike_days(spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    d = (
        pd.DataFrame({"dt": o.o_orderdate, "y": cents})
        .groupby("dt", as_index=False)["y"]
        .sum()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    y = d.y.to_numpy()
    coefs = np.array([501 - 15 * j * j for j in range(-_SG_M, _SG_M + 1)])
    assert coefs.sum() == 3315  # kernel preserves constants exactly
    sm = np.convolve(y.astype("float64"), coefs[::-1], mode="valid") / 3315.0
    # align: sm[i] corresponds to y[i + m]
    interior = np.arange(_SG_M, len(y) - _SG_M)
    spikes = y[interior] - sm
    order = np.lexsort((d.dt.iloc[interior].astype(str), -np.abs(spikes)))[:5]
    assert len(rows) == 5
    for r, k in zip(rows, order):
        i = interior[k]
        assert r["dt"] == str(d.dt.iloc[i])[:10]
        assert abs(r["actual_dollars"] - y[i] / 100) < 0.011
        assert abs(r["smoothed_dollars"] - sm[k] / 100) < 0.011
        assert abs(r["spike_dollars"] - spikes[k] / 100) < 0.02
    # a constant series would smooth to itself: check kernel moment
    assert (coefs * np.arange(-_SG_M, _SG_M + 1)).sum() == 0
