"""Definition-level checks for ext103: literal four-fifths flags,
the shift-share additive identity, and a numpy AR(1) fit."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext103 import (
    q_ar1_half_life,
    q_disparate_impact_audit,
    q_shift_share_decomposition,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_disparate_impact_definition(spark, sf_dir):
    rows = q_disparate_impact_audit(spark, sf_dir).collect()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_discount"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).toPandas()
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        cu, left_on="o_custkey", right_on="c_custkey"
    )
    j["got"] = (j.l_discount >= 0.05).astype(int)
    per = j.groupby("c_nationkey").got.agg(["size", "sum"])
    rates = per["sum"] / per["size"]
    ref = sorted(rates.index, key=lambda g: (-rates[g], g))[0]
    assert len(rows) == len(per)
    for r in rows:
        g = r["nationkey"]
        assert r["n_lines"] == int(per.loc[g, "size"])
        assert abs(r["discount_rate"] - rates[g]) < 1e-6
        assert abs(r["di_ratio"] - rates[g] / rates[ref]) < 1e-3
        exact_flag = (
            5 * int(per.loc[g, "sum"]) * int(per.loc[ref, "size"])
            < 4 * int(per.loc[ref, "sum"]) * int(per.loc[g, "size"])
        )
        assert (r["four_fifths_flag"] == "below-4/5") == exact_flag
    # the reference nation itself is never flagged
    ref_row = next(r for r in rows if r["nationkey"] == ref)
    assert ref_row["four_fifths_flag"] == "ok"
    assert abs(ref_row["di_ratio"] - 1.0) < 1e-9


def test_shift_share_identity(spark, sf_dir):
    rows = q_shift_share_decomposition(spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    ).toPandas()
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["yr"] = pd.to_datetime(j.o_orderdate).dt.year
    j = j[j.yr.isin([1996, 1997])]
    j["cents"] = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    wide = (
        j.pivot_table(
            index=["c_nationkey", "c_mktsegment"],
            columns="yr",
            values="cents",
            aggfunc="sum",
            fill_value=0,
        )
        .rename(columns={1996: "r0", 1997: "r1"})
        .reset_index()
    )
    # the query floors the CELL sum to whole dollars
    wide["r0"] = wide.r0 // 100
    wide["r1"] = wide.r1 // 100
    seg = wide.groupby("c_mktsegment")[["r0", "r1"]].sum()
    t0, t1 = int(wide.r0.sum()), int(wide.r1.sum())
    gnat = t1 / t0
    got = {r["nationkey"]: r for r in rows}
    for g, grp in wide.groupby("c_nationkey"):
        grp = grp[grp.r0 > 0]
        natc = sum(r.r0 * (gnat - 1) for r in grp.itertuples())
        mixc = sum(
            r.r0 * (seg.loc[r.c_mktsegment, "r1"] / seg.loc[r.c_mktsegment, "r0"] - gnat)
            for r in grp.itertuples()
        )
        shrc = sum(
            r.r0
            * (r.r1 / r.r0 - seg.loc[r.c_mktsegment, "r1"] / seg.loc[r.c_mktsegment, "r0"])
            for r in grp.itertuples()
        )
        actual = int((grp.r1 - grp.r0).sum())
        r = got[g]
        assert r["actual_change_dollars"] == actual
        assert abs(r["national_component"] - natc) < 2
        assert abs(r["mix_component"] - mixc) < 2
        assert abs(r["share_component"] - shrc) < 2
        # additive identity (within integer truncation slack)
        assert abs(
            (r["national_component"] + r["mix_component"] + r["share_component"])
            - actual
        ) <= 3


def test_ar1_half_life_definition(spark, sf_dir):
    row = q_ar1_half_life(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    y = (
        pd.DataFrame({"dt": o.o_orderdate, "y": cents})
        .groupby("dt")["y"]
        .sum()
        .sort_index()
        .to_numpy()
        // 100
    ).astype("float64")
    yl, yt = y[:-1], y[1:]
    phi = np.cov(yl, yt, bias=True)[0, 1] / yl.var()
    assert row["n_pairs"] == len(yl)
    assert abs(row["ar1_phi"] - phi) < 1e-5
    if 0 < phi < 1:
        assert abs(row["half_life_days"] - np.log(2) / (-np.log(phi))) < 0.05
        assert row["regime"] == "mean-reverting"
    else:
        assert row["half_life_days"] is None
