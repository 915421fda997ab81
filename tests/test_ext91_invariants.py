"""Definition-level checks for ext91: literal TOST z's, a python SPRT
walk, and sorted-share CR-k."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext91 import (
    _SPRT_ALPHA,
    _SPRT_P0,
    _SPRT_P1,
    _TOST_DELTA,
    q_concentration_curve_crk,
    q_sprt_replay,
    q_tost_equivalence,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_tost_definition(spark, sf_dir):
    row = q_tost_equivalence(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    ).toPandas()
    arm = (o.o_custkey % 2).to_numpy()
    hit = (o.o_orderpriority == "1-URGENT").to_numpy()
    n1, n0 = int((arm == 1).sum()), int((arm == 0).sum())
    p1, p0 = hit[arm == 1].mean(), hit[arm == 0].mean()
    delta = float(_TOST_DELTA)
    se = math.sqrt(p1 * (1 - p1) / n1 + p0 * (1 - p0) / n0)
    assert row["n_arm1"] == n1 and row["n_arm0"] == n0
    assert abs(row["diff"] - (p1 - p0)) < 1e-6
    zl, zu = (p1 - p0 + delta) / se, (delta - (p1 - p0)) / se
    assert abs(row["z_lower"] - zl) < 1e-3
    assert abs(row["z_upper"] - zu) < 1e-3
    assert (row["verdict"] == "equivalent") == (zl > 1.645 and zu > 1.645)
    # TOST z's sum to 2 delta / se by construction
    assert abs((row["z_lower"] + row["z_upper"]) - 2 * delta / se) < 1e-3


def test_sprt_definition(spark, sf_dir):
    row = q_sprt_replay(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_orderpriority"
    ).toPandas()
    o["hit"] = (o.o_orderpriority == "1-URGENT").astype(int)
    d = o.groupby("o_orderdate").hit.agg(["size", "sum"]).sort_index()
    p0, p1 = float(_SPRT_P0), float(_SPRT_P1)
    alpha = float(_SPRT_ALPHA)
    c1 = math.floor(1e9 * math.log(p1 / p0) + 0.5)
    c2 = math.floor(1e9 * math.log((1 - p1) / (1 - p0)) + 0.5)
    bnd = math.floor(1e9 * math.log((1 - alpha) / alpha) + 0.5)
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
    # final_llr is the full-walk value regardless of stopping
    assert abs(row["final_llr"] - llr / 1e9) < 1e-6
    assert row["decision"] == decision
    if ddate is None:
        assert row["decision_date"] is None
    else:
        assert row["decision_date"] == str(ddate)[:10]


def test_crk_definition(spark, sf_dir):
    row = q_concentration_curve_crk(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    g = (
        pd.DataFrame({"ck": o.o_custkey, "s": cents})
        .groupby("ck")["s"]
        .sum()
        .reset_index()
        .sort_values(["s", "ck"], ascending=[False, True])
    )
    s = g.s.to_numpy()
    tot = s.sum()
    assert row["n_customers"] == len(s)
    for k, col in [(1, "cr1"), (4, "cr4"), (8, "cr8"), (20, "cr20")]:
        assert abs(row[col] - s[:k].sum() / tot) < 1e-6
    eff = float(tot) ** 2 / (s.astype("float64") ** 2).sum()
    assert abs(row["effective_customers"] - eff) < 0.05
    # the curve is increasing in k and bounded by 1
    assert row["cr1"] <= row["cr4"] <= row["cr8"] <= row["cr20"] <= 1.0
