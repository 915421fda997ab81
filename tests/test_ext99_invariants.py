"""Definition-level checks for ext99: literal NW variance, a python
logrank split search, and the Damgaard-Weiner asymmetry."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext99 import (
    _CHURN_GAP_DAYS,
    _NW_LAGS,
    q_lorenz_asymmetry,
    q_newey_west_slope_se,
    q_survival_split_stump,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_newey_west_definition(spark, sf_dir):
    row = q_newey_west_slope_se(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    y = (
        pd.DataFrame({"dt": o.o_orderdate, "c": cents})
        .groupby("dt")["c"]
        .sum()
        .sort_index()
        .to_numpy()
        // 100
    ).astype("int64")
    n = len(y)
    t = np.arange(1, n + 1, dtype="float64")
    b = np.cov(t, y.astype("float64"), bias=True)[0, 1] / t.var()
    a = y.mean() - b * t.mean()
    e = np.floor(y - a - b * t + 0.5).astype("int64")
    xc = t - t.mean()
    u = xc * e
    sxx = (xc**2).sum()
    gam = [
        (u[l:] * u[: n - l]).sum() if l else (u * u).sum()
        for l in range(_NW_LAGS + 1)
    ]
    s_hac = gam[0] + 2 * sum(
        (1 - l / (_NW_LAGS + 1)) * gam[l] for l in range(1, _NW_LAGS + 1)
    )
    se_nw = np.sqrt(s_hac) / sxx
    se_ols = np.sqrt((e.astype("float64") ** 2).sum() / (n - 2) / sxx)
    assert row["n_days"] == n
    assert abs(row["slope_dollars_per_day"] - b) < max(1e-3, 1e-4 * abs(b))
    assert abs(row["se_ols"] - se_ols) < max(1e-3, 1e-3 * se_ols)
    assert abs(row["se_nw"] - se_nw) < max(1e-3, 1e-3 * se_nw)
    assert abs(row["hac_inflation"] - se_nw / se_ols) < 1e-3
    # with positive serial correlation, HAC must inflate
    assert row["hac_inflation"] > 0.0


def test_survival_split_definition(spark, sf_dir):
    row = q_survival_split_stump(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    o["dt"] = pd.to_datetime(o.o_orderdate)
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    end = o.dt.max() - pd.Timedelta(days=_CHURN_GAP_DAYS)
    g = o.groupby("o_custkey").agg(
        spend=("cents", "sum"), first=("dt", "min"), last=("dt", "max")
    )
    g["spend"] //= 100
    g["life"] = (g["last"] - g["first"]).dt.days
    g["ev"] = (g["last"] < end).astype(int)
    g = g.sort_values(["spend"]).reset_index()
    g2 = g.sort_values(["spend", "o_custkey"]).reset_index(drop=True)
    n = len(g2)
    # ntile(9) cut values
    base, rem = divmod(n, 9)
    cuts = []
    start = 0
    for tile in range(1, 9):
        size = base + (1 if tile <= rem else 0)
        cuts.append(int(g2.spend.iloc[start + size - 1]))
        start += size

    def logrank(cut):
        hi = g2.spend > cut
        oe = vv = 0.0
        for tt in sorted(g2.life[g2.ev == 1].unique()):
            at = g2.life >= tt
            n1 = int((at & hi).sum())
            n0 = int((at & ~hi).sum())
            d1 = int((hi & (g2.life == tt) & (g2.ev == 1)).sum())
            d0 = int((~hi & (g2.life == tt) & (g2.ev == 1)).sum())
            d, nn = d1 + d0, n1 + n0
            if d == 0 or nn == 0:
                continue
            oe += d1 - d * n1 / nn
            if nn > 1:
                vv += d * (n1 / nn) * (n0 / nn) * (nn - d) / (nn - 1)
        return oe, oe / np.sqrt(vv)

    scored = []
    for i, c in enumerate(cuts, start=1):
        oe, z = logrank(c)
        scored.append((i, c, oe, z))
    best = max(scored, key=lambda s: (abs(s[3]), -s[0]))
    assert row["decile_cut"] == best[0]
    assert row["spend_cut_dollars"] == best[1]
    assert abs(row["logrank_oe"] - best[2]) < 0.05
    assert abs(row["logrank_z"] - best[3]) < 0.01


def test_lorenz_asymmetry_definition(spark, sf_dir):
    row = q_lorenz_asymmetry(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    g = (
        o.groupby("o_custkey").cents.sum().reset_index()
        .sort_values(["cents", "o_custkey"])
    )
    s = g.cents.to_numpy().astype("float64")
    n = len(s)
    mu = s.mean()
    m = int((s < mu).sum())
    delta = (mu - s[m - 1]) / (s[m] - s[m - 1])
    f_mu = (m + delta) / n
    l_mu = (s[:m].sum() + delta * s[m]) / s.sum()
    assert row["n_customers"] == n
    assert abs(row["f_at_mean"] - f_mu) < 1e-4
    assert abs(row["l_at_mean"] - l_mu) < 1e-4
    assert abs(row["lorenz_asymmetry"] - (f_mu + l_mu)) < 1e-4
    # F and L at the mean are ordered: L(mu) <= F(mu) on a Lorenz curve
    assert row["l_at_mean"] <= row["f_at_mean"] + 1e-9
