"""Definition-level checks for ext84: literal numpy fits (median-rank
Weibull OLS, lognormal moments, gamma MoM) and Tukey q re-derivation."""

from __future__ import annotations

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext84 import (
    q_gamma_fit_mom,
    q_lognormal_fit_gibrat,
    q_tukey_hsd_contrasts,
    q_weibull_median_rank_fit,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_weibull_definition(spark, sf_dir):
    row = q_weibull_median_rank_fit(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    import pandas as pd

    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    d = (
        (pd.to_datetime(j.l_shipdate) - pd.to_datetime(j.o_orderdate)).dt.days
    ).to_numpy()
    d = d[d >= 1]
    n = len(d)
    assert row["n_lines"] == n
    # literal midrank plotting positions per row
    sd = np.sort(d)
    # midrank of each row = average rank over its tie block
    uniq, start = np.unique(sd, return_index=True)
    counts = np.diff(np.append(start, n))
    mid = start + (counts + 1) / 2.0  # 1-based: start is 0-based -> +1 -1 cancels +?
    mid = start + 1 + (counts - 1) / 2.0
    f = (mid - 0.3) / (n + 0.4)
    x = np.log(uniq.astype("float64"))
    y = np.log(-np.log(1 - f))
    w = counts.astype("float64")
    sw = w.sum()
    mx = (w * x).sum() / sw
    my = (w * y).sum() / sw
    cov = (w * (x - mx) * (y - my)).sum()
    vx = (w * (x - mx) ** 2).sum()
    vy = (w * (y - my) ** 2).sum()
    k = cov / vx
    lam = np.exp(-(my - k * mx) / k)
    assert abs(row["shape_k"] - k) < 5e-3
    assert abs(row["scale_days"] - lam) < max(0.05, 1e-3 * lam)
    assert abs(row["fit_r2"] - cov * cov / (vx * vy)) < 1e-3
    assert 0.0 <= row["fit_r2"] <= 1.0 and row["shape_k"] > 0


def test_lognormal_definition(spark, sf_dir):
    row = q_lognormal_fit_gibrat(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()
    v = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    ln = np.log(v.astype("float64"))
    mu, sigma = ln.mean(), ln.std(ddof=0)
    assert row["n_orders"] == len(v)
    assert abs(row["mu_log_cents"] - mu) < 1e-5
    assert abs(row["sigma_log"] - sigma) < 1e-5
    assert abs(row["implied_median_dollars"] - np.exp(mu) / 100) < 0.05
    im = np.exp(mu + sigma**2 / 2)
    assert abs(row["implied_mean_dollars"] - im / 100) < 0.05
    assert abs(row["actual_mean_dollars"] - v.mean() / 100) < 0.05
    assert abs(row["lognormality_ratio"] - im / v.mean()) < 1e-4


def test_gamma_definition(spark, sf_dir):
    row = q_gamma_fit_mom(spark, sf_dir).collect()[0]
    import pandas as pd

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    y = (
        pd.DataFrame({"dt": o.o_orderdate, "y": cents})
        .groupby("dt")["y"]
        .sum()
        .to_numpy()
        .astype("float64")
    )
    m, v = y.mean(), y.var(ddof=0)
    assert row["n_days"] == len(y)
    assert abs(row["mean_dollars"] - m / 100) < 0.02
    assert abs(row["shape_alpha"] - m * m / v) < 1e-3
    assert abs(row["scale_dollars"] - v / m / 100) < 0.02
    assert abs(row["coef_variation"] - np.sqrt(v) / m) < 1e-5
    # MoM consistency: CV == 1/sqrt(shape)
    assert abs(row["coef_variation"] - 1 / np.sqrt(row["shape_alpha"])) < 1e-3


def test_tukey_definition(spark, sf_dir):
    rows = q_tukey_hsd_contrasts(spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    v = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64") // 100
    g = o.o_orderpriority.to_numpy()
    groups = sorted(set(g))
    k = len(groups)
    assert len(rows) == k * (k - 1) // 2
    n = len(v)
    wss = sum(
        ((v[g == gr] - v[g == gr].mean()) ** 2).sum() for gr in groups
    )
    mse = wss / (n - k)
    for r in rows:
        a, b = r["group_a"], r["group_b"]
        assert a < b
        xa, xb = v[g == a], v[g == b]
        diff = xa.mean() - xb.mean()
        se = np.sqrt(mse / 2 * (1 / len(xa) + 1 / len(xb)))
        assert abs(r["mean_diff_dollars"] - diff) < 0.02
        assert abs(r["tukey_q"] - diff / se) < 1e-2
