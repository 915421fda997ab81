"""Definition-level checks for ext77: literal numpy/pandas
re-derivations of Cochran's Q, the Cochran-Armitage trend z, the
Poisson dispersion index, and Cohen's d."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext77 import (
    _CQ_YEARS,
    q_cochran_armitage_trend,
    q_cochrans_q,
    q_cohens_d_effect,
    q_poisson_dispersion,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_cochrans_q_definition(spark, sf_dir):
    row = q_cochrans_q(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    ).toPandas()
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    o = o[o.yr.isin(_CQ_YEARS)]
    # literal 0/1 matrix: subjects x years
    mat = (
        o.assign(one=1)
        .pivot_table(index="o_custkey", columns="yr", values="one", fill_value=0)
        .to_numpy()
    )
    n, k = mat.shape
    cj = mat.sum(axis=0)
    ri = mat.sum(axis=1)
    num = (k - 1) * (k * (cj**2).sum() - ri.sum() ** 2)
    den = k * ri.sum() - (ri**2).sum()
    assert row["n_subj"] == n
    assert row["k_periods"] == k == len(_CQ_YEARS)
    assert row["dof"] == k - 1
    assert abs(row["q_stat"] - num / den) < 1e-3
    assert row["q_stat"] >= 0.0


def test_cochran_armitage_definition(spark, sf_dir):
    row = q_cochran_armitage_trend(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_returnflag"
    ).toPandas()
    x = li.l_quantity.to_numpy().astype("int64")
    r = (li.l_returnflag == "R").to_numpy().astype("int64")
    n = len(x)
    pbar = r.mean()
    t = float((x * r).sum()) - pbar * float(x.sum())
    var = pbar * (1 - pbar) * (float((x * x).sum()) - float(x.sum()) ** 2 / n)
    z = t / np.sqrt(var)
    assert row["n_lines"] == n
    assert row["n_levels"] == len(np.unique(x))
    assert abs(row["pooled_rate"] - pbar) < 1e-6
    assert abs(row["z_trend"] - z) < 1e-4


def test_poisson_dispersion_definition(spark, sf_dir):
    row = q_poisson_dispersion(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderdate").toPandas()
    c = o.groupby("o_orderdate").size().to_numpy().astype("float64")
    n = len(c)
    chi2 = ((c - c.mean()) ** 2).sum() / c.mean()
    di = chi2 / (n - 1)
    assert row["n_days"] == n
    assert abs(row["mean_per_day"] - c.mean()) < 1e-3
    assert abs(row["chi2_stat"] - chi2) < max(1e-3, 1e-9 * chi2)
    assert abs(row["dispersion_index"] - di) < 1e-5
    assert (row["verdict"] == "overdispersed") == (di > 1.0)
    # dispersion index equals the classic s^2/xbar up to (n-1) scaling
    s2 = c.var(ddof=1)
    assert abs(row["dispersion_index"] - s2 / c.mean()) < 1e-5


def test_cohens_d_definition(spark, sf_dir):
    row = q_cohens_d_effect(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    sel = o[o.o_orderpriority.isin(["1-URGENT", "5-LOW"])]
    v = np.floor(sel.o_totalprice.to_numpy() * 100 + 0.5)
    u = (sel.o_orderpriority == "1-URGENT").to_numpy()
    x, y = v[u], v[~u]
    n1, n0 = len(x), len(y)
    sp2 = ((x - x.mean()) ** 2).sum() + ((y - y.mean()) ** 2).sum()
    sp2 /= n1 + n0 - 2
    d = (x.mean() - y.mean()) / np.sqrt(sp2)
    jf = 1 - 3 / (4 * (n1 + n0 - 2) - 1)
    assert row["n_urgent"] == n1 and row["n_low"] == n0
    assert abs(row["mean_diff_dollars"] - (x.mean() - y.mean()) / 100) < 0.02
    assert abs(row["cohens_d"] - d) < 1e-5
    assert abs(row["hedges_g"] - d * jf) < 1e-5
    # the correction always shrinks |d|
    assert abs(row["hedges_g"]) <= abs(row["cohens_d"]) + 1e-12
