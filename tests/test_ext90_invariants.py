"""Definition-level checks for ext90: literal WE rule scan, direct
CCC/Bland-Altman re-derivations."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext90 import (
    q_bland_altman_limits,
    q_lins_ccc_agreement,
    q_western_electric_alarms,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_western_electric_definition(spark, sf_dir):
    row = q_western_electric_alarms(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    d = (
        pd.DataFrame({"dt": pd.to_datetime(o.o_orderdate), "y": cents})
        .groupby("dt")["y"]
        .sum()
        .sort_index()
    )
    co = d.index.min() + pd.Timedelta(days=365)
    base = d[d.index <= co].to_numpy().astype("float64")
    mon = d[d.index > co]
    mu, sg = base.mean(), base.std(ddof=0)
    y = mon.to_numpy().astype("float64")
    n = len(y)
    assert row["n_monitored"] == n
    a2 = (y > mu + 2 * sg).astype(int)
    b2 = (y < mu - 2 * sg).astype(int)
    a1 = (y > mu + sg).astype(int)
    b1 = (y < mu - sg).astype(int)
    ab = (y > mu).astype(int)
    bl = (y < mu).astype(int)
    r1 = ((y > mu + 3 * sg) | (y < mu - 3 * sg)).astype(int)

    def roll(x, k, thresh, eq=False):
        out = np.zeros(len(x), dtype=int)
        c = pd.Series(x).rolling(k, min_periods=1).sum().to_numpy()
        return (c == thresh).astype(int) if eq else (c >= thresh).astype(int)

    r2 = ((roll(a2, 3, 2) + roll(b2, 3, 2)) > 0).astype(int)
    r3 = ((roll(a1, 5, 4) + roll(b1, 5, 4)) > 0).astype(int)
    # rule 4 requires EXACTLY 8 of the last 8 -- min_periods must be 8
    c_ab = pd.Series(ab).rolling(8, min_periods=8).sum().to_numpy()
    c_bl = pd.Series(bl).rolling(8, min_periods=8).sum().to_numpy()
    r4 = (np.nan_to_num(c_ab) == 8) | (np.nan_to_num(c_bl) == 8)
    assert row["rule1_days"] == int(r1.sum())
    assert row["rule2_days"] == int(r2.sum())
    assert row["rule3_days"] == int(r3.sum())
    assert row["rule4_days"] == int(r4.sum())
    any_alarm = (r1 + r2 + r3 + r4.astype(int)) > 0
    if any_alarm.any():
        first = mon.index[np.argmax(any_alarm)]
        assert row["first_alarm_date"] == str(first)[:10]
    else:
        assert row["first_alarm_date"] is None


def _pairs(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).toPandas()
    li["cents"] = np.floor(li.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64")
    g = li.groupby("l_orderkey").cents.sum()
    j = o.merge(g, left_on="o_orderkey", right_index=True)
    x = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    y = j.cents.to_numpy()
    return x.astype("float64"), y.astype("float64")


def test_lins_ccc_definition(spark, sf_dir):
    row = q_lins_ccc_agreement(spark, sf_dir).collect()[0]
    x, y = _pairs(spark, sf_dir)
    assert row["n_orders"] == len(x)
    vx, vy = x.var(), y.var()
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    r = cxy / np.sqrt(vx * vy)
    ccc = 2 * cxy / (vx + vy + (x.mean() - y.mean()) ** 2)
    assert abs(row["pearson_r"] - r) < 1e-5
    assert abs(row["lins_ccc"] - ccc) < 1e-5
    assert abs(row["accuracy_cb"] - ccc / r) < 1e-5
    assert abs(row["mean_shift_dollars"] - (x.mean() - y.mean()) / 100) < 0.05
    # CCC never exceeds |r|
    assert abs(row["lins_ccc"]) <= abs(row["pearson_r"]) + 1e-9


def test_bland_altman_definition(spark, sf_dir):
    row = q_bland_altman_limits(spark, sf_dir).collect()[0]
    x, y = _pairs(spark, sf_dir)
    d = x - y
    md, sd = d.mean(), d.std(ddof=0)
    assert row["n_orders"] == len(d)
    assert abs(row["mean_diff_dollars"] - md / 100) < 0.05
    assert abs(row["loa_low_dollars"] - (md - 1.96 * sd) / 100) < 0.05
    assert abs(row["loa_high_dollars"] - (md + 1.96 * sd) / 100) < 0.05
    frac = ((d > md + 1.96 * sd) | (d < md - 1.96 * sd)).mean()
    assert abs(row["frac_outside"] - frac) < 1e-6
    assert 0.0 <= row["frac_outside"] <= 0.2
