"""Definition-level checks for ext94: numpy CCF, a literal two-stage
EG/ADF, and statsmodels-free Granger F via lstsq."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext94 import (
    _CCF_MAX_LAG,
    q_ccf_lead_lag,
    q_engle_granger_adf,
    q_granger_causality_1lag,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _series(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    g = (
        pd.DataFrame({"dt": o.o_orderdate, "c": cents})
        .groupby("dt")
        .agg(x=("c", "size"), y=("c", "sum"))
        .sort_index()
    )
    return g.x.to_numpy().astype("int64"), (g.y.to_numpy() // 100).astype("int64")


def test_ccf_definition(spark, sf_dir):
    rows = {r["lag_days"]: r for r in q_ccf_lead_lag(spark, sf_dir).collect()}
    x, y = _series(spark, sf_dir)
    n = len(x)
    assert sorted(rows) == list(range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1))
    for k in rows:
        if k >= 0:
            xv, yv = x[: n - k], y[k:]
        else:
            xv, yv = x[-k:], y[: n + k]
        r = np.corrcoef(xv.astype("float64"), yv.astype("float64"))[0, 1]
        assert rows[k]["n_pairs"] == len(xv)
        assert abs(rows[k]["ccf"] - r) < 1e-5
    # k = 0 reproduces the plain correlation
    r0 = np.corrcoef(x.astype("float64"), y.astype("float64"))[0, 1]
    assert abs(rows[0]["ccf"] - r0) < 1e-5


def test_engle_granger_definition(spark, sf_dir):
    row = q_engle_granger_adf(spark, sf_dir).collect()[0]
    x, y = _series(spark, sf_dir)
    xf, yf = x.astype("float64"), y.astype("float64")
    b = np.cov(xf, yf, bias=True)[0, 1] / xf.var()
    a = yf.mean() - b * xf.mean()
    e = np.floor(yf - a - b * xf + 0.5).astype("int64")
    ep, de = e[:-1], np.diff(e)
    rho = (ep * de).sum() / (ep * ep).sum()
    s2 = ((de - rho * ep) ** 2).sum() / (len(de) - 2)
    t = rho / np.sqrt(s2 / (ep.astype("float64") ** 2).sum())
    assert row["n_diffs"] == len(de)
    assert abs(row["rho"] - rho) < 1e-5
    assert abs(row["adf_t"] - t) < 1e-3
    assert (row["verdict"] == "cointegrated-5pct") == (t < -3.37)
    # rho must be negative for any mean-reverting residual
    assert row["rho"] < 0


def test_granger_definition(spark, sf_dir):
    row = q_granger_causality_1lag(spark, sf_dir).collect()[0]
    x, y = _series(spark, sf_dir)
    yt = y[1:].astype("float64")
    yl = y[:-1].astype("float64")
    xl = x[:-1].astype("float64")
    n = len(yt)
    assert row["n_obs"] == n
    Xu = np.column_stack([np.ones(n), yl, xl])
    bu, *_ = np.linalg.lstsq(Xu, yt, rcond=None)
    rss_u = ((yt - Xu @ bu) ** 2).sum()
    Xr = np.column_stack([np.ones(n), yl])
    br, *_ = np.linalg.lstsq(Xr, yt, rcond=None)
    rss_r = ((yt - Xr @ br) ** 2).sum()
    fstat = (rss_r - rss_u) / (rss_u / (n - 3))
    assert abs(row["beta_count_lag"] - bu[2]) < max(1e-3, 1e-4 * abs(bu[2]))
    assert abs(row["f_stat"] - fstat) < max(1e-2, 1e-4 * fstat)
    assert (row["verdict"] == "count-granger-causes-revenue") == (fstat > 3.85)
    assert rss_u <= rss_r + 1e-9  # adding a regressor can't hurt RSS
