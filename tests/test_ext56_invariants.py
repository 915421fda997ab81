"""Definition-level checks for the ext56 batch."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext56 import (
    q_last_digit_uniformity,
    q_longest_increase_streak,
    q_simpsons_paradox_check,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_simpsons_signs_match_literal_rates(spark, sf_dir):
    got = q_simpsons_paradox_check(spark, sf_dir).toPandas().set_index("seg")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    ).toPandas()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag").toPandas()
    bad = set(li[li.l_returnflag == "R"].l_orderkey)
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["t"] = df.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(int)
    df["y"] = df.o_orderkey.isin(bad).astype(int)
    pooled_kt = pooled_nt = pooled_kc = pooled_nc = 0
    rows = {}
    for seg, g in df.groupby("c_mktsegment"):
        kt = int(g[g.t == 1].y.sum())
        nt = int((g.t == 1).sum())
        kc = int(g[g.t == 0].y.sum())
        nc = int((g.t == 0).sum())
        if nt and nc:
            rows[seg] = (kt, nt, kc, nc)
            pooled_kt += kt
            pooled_nt += nt
            pooled_kc += kc
            pooled_nc += nc
    psign = np.sign(pooled_kt * pooled_nc - pooled_kc * pooled_nt)
    assert set(got.index) == set(rows)
    for seg, (kt, nt, kc, nc) in rows.items():
        r = got.loc[seg]
        ssign = np.sign(kt * nc - kc * nt)
        assert (int(r.k_t), int(r.n_t), int(r.k_c), int(r.n_c)) == (kt, nt, kc, nc)
        assert int(r.stratum_sign) == ssign
        assert int(r.pooled_sign) == psign
        assert int(r.is_reversed) == int(ssign * psign < 0)


def test_longest_streak_matches_literal_scan(spark, sf_dir):
    got = q_longest_increase_streak(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = np.round(o.o_totalprice * 100).astype("int64")
    days = o.groupby("o_orderdate").c.sum().sort_index()
    best_len, best_start, cur_len, cur_start = 1, days.index[0], 1, days.index[0]
    prev = days.iloc[0]
    for d, c in days.iloc[1:].items():
        if c > prev:
            cur_len += 1
        else:
            cur_len, cur_start = 1, d
        if cur_len > best_len:
            best_len, best_start = cur_len, cur_start
        prev = c
    assert int(got.streak_days) == best_len
    assert got.start_date == best_start.strftime("%Y-%m-%d")


def test_last_digit_chi2_matches_literal_counts(spark, sf_dir):
    got = q_last_digit_uniformity(spark, sf_dir).toPandas().set_index("last_digit")
    o = read_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()
    digs = (np.round(o.o_totalprice * 100).astype("int64") % 10).value_counts()
    nn = int(digs.sum())
    e = nn / 10
    for d, n in digs.items():
        row = got.loc[d]
        assert int(row.n) == int(n)
        assert abs(int(row.chi2_term_e9) - 1e9 * (int(n) - e) ** 2 / e) < 2
    # synthetic prices are uniform in last digit: chi2 should be small
    chi2 = got.chi2_term_e9.sum() / 1e9
    assert chi2 < 100  # df=9; anything wild means the digits aren't uniform
