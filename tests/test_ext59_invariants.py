"""Definition-level checks for the ext59 batch."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext59 import (
    _H_E6,
    _W_OK,
    _W_RET,
    q_bernoulli_cusum_monitor,
    q_kish_ess,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_bernoulli_cusum_equals_sequential_recursion(spark, sf_dir):
    got = q_bernoulli_cusum_monitor(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate").toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag").toPandas()
    bad = set(li[li.l_returnflag == "R"].l_orderkey)
    o["y"] = o.o_orderkey.isin(bad).astype(int)
    daily = o.groupby("o_orderdate").y.agg(["sum", "size"]).sort_index()
    # LITERAL sequential recursion S_t = max(0, S_{t-1} + w_t)
    s = 0
    max_s = 0
    alarms = 0
    for _, r in daily.iterrows():
        w = int(r["sum"]) * _W_RET + int(r["size"] - r["sum"]) * _W_OK
        s = max(0, s + w)
        max_s = max(max_s, s)
        if s > _H_E6:
            alarms += 1
    assert int(got.n_days) == len(daily)
    assert int(got.max_s_e6) == max_s  # clamp closed form == recursion
    assert int(got.n_alarm_days) == alarms


def test_kish_ess_matches_literal_moments(spark, sf_dir):
    got = q_kish_ess(spark, sf_dir).toPandas().iloc[0]
    cust = read_table(spark, sf_dir, "customer").select("c_acctbal").toPandas()
    w = np.maximum(np.round(cust.c_acctbal * 100).astype("int64"), 1)
    n = len(w)
    s1, s2 = int(w.sum()), int((w.astype(object) * w.astype(object)).sum())
    ess = float(s1) * s1 / s2
    assert int(got.n) == n
    assert math.isclose(float(got.ess), ess, abs_tol=1e-5)  # round(6) output
    assert int(got.ess_ratio_ppm) == (1000000 * round(ess)) // n
    # ESS can never exceed n (Cauchy-Schwarz)
    assert float(got.ess) <= n + 1e-6
