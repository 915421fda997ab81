"""Definition-level checks for ext82: literal iterative GESD in numpy,
Hotelling's T^2 via np.linalg, and a brute-force weighted kappa."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext82 import (
    _GESD_ROUNDS,
    q_gesd_outliers,
    q_hotelling_t2,
    q_weighted_kappa_ordinal,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_gesd_definition(spark, sf_dir):
    rows = q_gesd_outliers(spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    d = (
        pd.DataFrame({"dt": o.o_orderdate.astype(str), "y": cents})
        .groupby("dt", as_index=False)["y"]
        .sum()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    dts = d.dt.to_numpy()
    ys = d.y.to_numpy()
    alive = np.ones(len(ys), dtype=bool)
    assert len(rows) == _GESD_ROUNDS
    for rnd, r in enumerate(rows, start=1):
        assert r["round"] == rnd
        n = int(alive.sum())
        s = int(ys[alive].sum())
        dev = np.abs(n * ys.astype(object) - s)
        dev[~alive] = -1
        # argmax with date tiebreak
        best = max(
            (int(dev[i]), dts[i], i) for i in range(len(ys)) if alive[i]
        )
        cand = [i for i in range(len(ys)) if alive[i] and int(dev[i]) == best[0]]
        i_star = min(cand, key=lambda i: dts[i])
        assert r["dt"] == dts[i_star][:10]
        assert abs(r["value_dollars"] - ys[i_star] / 100) < 0.011
        sd = ys[alive].astype("float64").std(ddof=1)
        expect = abs(ys[i_star] - ys[alive].mean()) / sd
        assert abs(r["r_stat"] - expect) < 1e-4
        alive[i_star] = False
    # R decreases weakly only sometimes; at least all positive
    assert all(r["r_stat"] > 0 for r in rows)


def test_hotelling_definition(spark, sf_dir):
    row = q_hotelling_t2(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).toPandas()
    li["q"] = li.l_quantity.astype("int64")
    g = li.groupby("l_orderkey").agg(x1=("q", "size"), x2=("q", "sum"))
    j = o[o.o_orderpriority.isin(["1-URGENT", "5-LOW"])].merge(
        g, left_on="o_orderkey", right_index=True
    )
    X = j[["x1", "x2"]].to_numpy().astype("float64")
    u = (j.o_orderpriority == "1-URGENT").to_numpy()
    x, y = X[u], X[~u]
    n1, n0 = len(x), len(y)
    assert row["n_urgent"] == n1 and row["n_low"] == n0
    d = x.mean(axis=0) - y.mean(axis=0)
    w = (
        (x - x.mean(axis=0)).T @ (x - x.mean(axis=0))
        + (y - y.mean(axis=0)).T @ (y - y.mean(axis=0))
    ) / (n1 + n0 - 2)
    t2 = n1 * n0 / (n1 + n0) * d @ np.linalg.inv(w) @ d
    assert abs(row["mean_diff_lines"] - d[0]) < 1e-3
    assert abs(row["mean_diff_qty"] - d[1]) < 1e-3
    assert abs(row["t2_stat"] - t2) < max(1e-2, 1e-5 * t2)
    f = (n1 + n0 - 3) / (2 * (n1 + n0 - 2)) * t2
    assert abs(row["f_stat"] - f) < max(1e-2, 1e-5 * f)
    assert row["t2_stat"] >= 0.0


def test_weighted_kappa_definition(spark, sf_dir):
    row = q_weighted_kappa_ordinal(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).toPandas()
    ra = o.o_orderpriority.str[0].astype(int).to_numpy()
    v = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    ok = o.o_orderkey.to_numpy()
    n = len(v)
    assert row["n_orders"] == n
    # ntile(5) over (v, ok): first n%5 tiles get ceil(n/5)
    order = np.lexsort((ok, v))
    rb = np.empty(n, dtype="int64")
    base, rem = divmod(n, 5)
    start = 0
    for tile in range(1, 6):
        size = base + (1 if tile <= rem else 0)
        rb[order[start : start + size]] = tile
        start += size
    w = (ra[:, None] - np.arange(1, 6)[None, :]) ** 2
    swo = ((ra - rb) ** 2).sum()
    r_m = np.bincount(ra, minlength=6)[1:6]
    c_m = np.bincount(rb, minlength=6)[1:6]
    ww = (np.arange(1, 6)[:, None] - np.arange(1, 6)[None, :]) ** 2
    swrc = (ww * np.outer(r_m, c_m)).sum()
    kappa = 1 - n * swo / swrc
    assert abs(row["weighted_kappa"] - kappa) < 1e-6
    assert -1.0 <= row["weighted_kappa"] <= 1.0
    _ = w  # marginal-weight matrix spelled out above for clarity
