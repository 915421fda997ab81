"""Definition-level checks for the ext68 batch."""

from __future__ import annotations

import math

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext68 import (
    _CROSTON_A,
    _CROSTON_R,
    _HURST_MS,
    q_croston_intermittent_demand,
    q_hurst_exponent_rs,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _daily(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    days = o.o_orderdate.to_numpy()
    order = np.argsort(days, kind="mergesort")
    uniq, idx = np.unique(days[order], return_index=True)
    return np.add.reduceat(cents[order], idx)


def test_hurst_matches_literal_rs(spark, sf_dir):
    row = q_hurst_exponent_rs(spark, sf_dir).collect()[0]
    x = _daily(spark, sf_dir).astype(object)
    pts = []
    total_blocks = 0
    for m in _HURST_MS:
        ratios = []
        for b in range(len(x) // m):
            blk = x[b * m : (b + 1) * m]
            sx, sxx = sum(blk), sum(v * v for v in blk)
            var_num = m * sxx - sx * sx
            if var_num <= 0:
                continue
            dev = [m * sum(blk[: j + 1]) - (j + 1) * sx for j in range(m)]
            r_over_m = (max(dev) - min(min(dev), 0)) / m
            s_pop = math.sqrt(var_num / (m * m))
            ratios.append(int(math.floor(1e9 * r_over_m / s_pop + 0.5)))
        total_blocks += len(ratios)
        pts.append((math.log(m), math.log(sum(ratios) / len(ratios) / 1e9)))
    n = len(pts)
    sx_ = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx_ = sum(p[0] * p[0] for p in pts)
    h = (n * sxy - sx_ * sy) / (n * sxx_ - sx_ * sx_)
    assert row["n_sizes"] == n
    assert row["n_blocks_total"] == total_blocks
    assert abs(row["hurst_h"] - h) < 1e-6
    # H is a Hurst exponent: must land in (0, 1) for any real series
    assert 0.0 < row["hurst_h"] < 1.0


def test_croston_matches_literal_recursion(spark, sf_dir):
    got = {r["pk"]: r for r in q_croston_intermittent_demand(spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    df = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    demand = (
        df.groupby(["l_partkey", "o_orderdate"]).l_quantity.sum().reset_index()
    )
    eligible = sorted(
        pk
        for pk, g in demand.groupby("l_partkey")
        if len(g) >= 5
    )[:20]
    assert sorted(got) == eligible
    for pk in eligible:
        g = demand[demand.l_partkey == pk].sort_values("o_orderdate")
        zs = g.l_quantity.astype(int).tolist()
        ds = g.o_orderdate.tolist()
        gaps = [(ds[i] - ds[i - 1]).days for i in range(1, len(ds))]
        # the literal recursions: z1 = z[0]; z_i = a*z + (1-a)*z_{i-1}
        z_hat = float(zs[0])
        for z in zs[1:]:
            z_hat = _CROSTON_A * z + _CROSTON_R * z_hat
        p_hat = float(gaps[0])
        for gp in gaps[1:]:
            p_hat = _CROSTON_A * gp + _CROSTON_R * p_hat
        r = got[pk]
        assert r["n_demands"] == len(zs)
        assert abs(r["size_ewma"] - z_hat) < 1e-5
        assert abs(r["interval_ewma_days"] - p_hat) < 1e-5
        assert abs(
            r["demand_per_day"] - round(r["size_ewma"], 8) / round(r["interval_ewma_days"], 8)
        ) < 2e-6
        # forecast bounded by observed extremes
        assert min(zs) - 1e-6 <= r["size_ewma"] <= max(zs) + 1e-6
        assert min(gaps) - 1e-6 <= r["interval_ewma_days"] <= max(gaps) + 1e-6
