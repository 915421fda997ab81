"""Definition-level checks for the ext50 batch."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext50 import (
    q_kendalls_w,
    q_transition_asymmetry,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_kendalls_w_matches_pandas_average_ranks(spark, sf_dir):
    got = q_kendalls_w(spark, sf_dir).toPandas().iloc[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate").toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["cents"] = np.round(j.l_extendedprice * 100).astype("int64")
    j["y"] = j.o_orderdate.dt.year
    revs = {
        y: j[j.y == y].groupby("l_partkey").cents.sum() for y in (1995, 1996, 1997)
    }
    common = sorted(set(revs[1995].index) & set(revs[1996].index) & set(revs[1997].index))
    n, m = len(common), 3
    ranks = {
        y: revs[y].loc[common].rank(method="average") for y in revs
    }
    sums = sum(ranks[y] for y in ranks)
    s = float(((sums - m * (n + 1) / 2) ** 2).sum())
    tie = 0
    for y in revs:
        counts = Counter(revs[y].loc[common].values)
        tie += sum(t**3 - t for t in counts.values() if t > 1)
    w = 12 * s / (m * m * (n**3 - n) - m * tie)
    assert int(got.n_parts) == n
    assert math.isclose(float(got.w), w, abs_tol=1e-5)
    assert 0.0 <= float(got.w) <= 1.0


def test_transition_asymmetry_matches_literal_counts(spark, sf_dir):
    got = q_transition_asymmetry(spark, sf_dir).toPandas()
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).toPandas()
    trans: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"]).event_type.tolist()
        for a, b in zip(seq, seq[1:]):
            if a != b:
                trans[(a, b)] += 1
    expect = {}
    for (a, b), n_ab in trans.items():
        if a < b:
            n_ba = trans.get((b, a), 0)
            if n_ab + n_ba >= 20:
                expect[(a, b)] = (n_ab, n_ba)
    have = {(r.ev_a, r.ev_b): (int(r.n_ab), int(r.n_ba)) for r in got.itertuples()}
    assert have == expect
    for r in got.itertuples():
        mtot = int(r.n_ab) + int(r.n_ba)
        z = (int(r.n_ab) - mtot / 2) / math.sqrt(mtot / 4)
        assert math.isclose(float(r.z_score), z, abs_tol=1e-5)
