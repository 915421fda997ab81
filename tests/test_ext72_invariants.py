"""Definition-level checks for the ext72 batch."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext72 import (
    _T_CLOSE,
    q_spiegelhalter_z,
    q_t_closeness_audit,
    q_twoway_fe_within,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_twoway_fe_matches_literal_demeaning(spark, sf_dir):
    row = q_twoway_fe_within(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_discount", "l_extendedprice"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    df = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    df["mth"] = df.o_orderdate.dt.year * 12 + df.o_orderdate.dt.month
    df["x"] = np.floor(df.l_discount * 100 + 0.5).astype("int64")
    df["y"] = np.floor(
        df.l_extendedprice * (1 - df.l_discount) * 100 + 0.5
    ).astype("int64")

    def gmeans(key):
        g = df.groupby(key).agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"))
        return {k: (int(v.sx) / int(v.n), int(v.sy) / int(v.n)) for k, v in g.iterrows()}

    mp, mm = gmeans("l_partkey"), gmeans("mth")
    tx, ty = df.x.sum() / len(df), df.y.sum() / len(df)
    sxy = sxx = 0
    for r in df.itertuples():
        xd = r.x - mp[r.l_partkey][0] - mm[r.mth][0] + tx
        yd = r.y - mp[r.l_partkey][1] - mm[r.mth][1] + ty
        sxy += int(math.floor(1e6 * xd * yd + 0.5))
        sxx += int(math.floor(1e6 * xd * xd + 0.5))
    assert row["n_lines"] == len(df)
    assert abs(row["fe_slope_cents_per_pct"] - sxy / sxx) < 1e-6
    # sanity: more discount must lower net revenue per line (y includes
    # the (1 - discount) factor directly)
    assert row["fe_slope_cents_per_pct"] < 0


def test_t_closeness_matches_literal_emd(spark, sf_dir):
    got = {
        (r["nation"], r["seg"]): r
        for r in q_t_closeness_audit(spark, sf_dir).collect()
    }
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    ).toPandas()
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    ).toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["prio"] = df.o_orderpriority.str[0].astype(int)
    n_glob = len(df)
    cum_g = {p: int((df.prio <= p).sum()) for p in range(1, 6)}
    for (nat, seg), g in df.groupby(["c_nationkey", "c_mktsegment"]):
        n = len(g)
        num = sum(
            abs(int((g.prio <= p).sum()) * n_glob - cum_g[p] * n)
            for p in range(1, 5)
        )
        emd_ppm = (1000000 * num) // (n * n_glob * 4)
        r = got[(nat, seg)]
        assert r["n_class"] == n
        assert r["emd_ppm"] == emd_ppm
        assert r["violates_t"] == (1 if emd_ppm > _T_CLOSE * 1000000 else 0)
        assert 0 <= r["emd_ppm"] <= 1000000  # EMD over distributions


def test_spiegelhalter_matches_literal_formula(spark, sf_dir):
    row = q_spiegelhalter_z(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).toPandas()
    ev["bin"] = np.minimum(np.floor(ev.value / 20.0).astype("int64"), 12)
    ev["half"] = (ev.event_id % 2).astype(int)
    ev["y"] = (ev.event_type == "purchase").astype(int)
    num = den = 0
    n_bins = 0
    for _, g in ev.groupby("bin"):
        tr, ee = g[g.half == 0], g[g.half == 1]
        if len(tr) == 0 or len(ee) == 0:
            continue
        n_bins += 1
        p = int(tr.y.sum()) / len(tr)
        num += int(math.floor(1e9 * (int(ee.y.sum()) - len(ee) * p) * (1 - 2 * p) + 0.5))
        den += int(math.floor(1e9 * len(ee) * (1 - 2 * p) ** 2 * p * (1 - p) + 0.5))
    z = (num / 1e9) / math.sqrt(den / 1e9)
    assert row["n_bins"] == n_bins
    assert abs(row["spiegelhalter_z"] - z) < 1e-6
