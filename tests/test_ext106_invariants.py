"""Definition-level checks for ext106: a literal python Bloom filter,
Counter-based entropy, and the exact birthday count."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext106 import (
    _BLOOM_K,
    _BLOOM_M,
    q_birthday_collision_check,
    q_bloom_fpr_calibration,
    q_supplier_market_entropy,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _md5_pos(key, i):
    h = hashlib.md5(str(key).encode()).hexdigest()
    return int(h[4 * i : 4 * i + 4], 16) % _BLOOM_M


def test_bloom_fpr_definition(spark, sf_dir):
    row = q_bloom_fpr_calibration(spark, sf_dir).collect()[0]
    import pandas as pd

    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    ).toPandas()
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    members = set(o[o.yr == 1996].o_custkey)
    probes = set(o[o.yr == 1997].o_custkey) - members
    bits = {
        _md5_pos(ck, i) for ck in members for i in range(_BLOOM_K)
    }
    fp = sum(
        1
        for ck in probes
        if all(_md5_pos(ck, i) in bits for i in range(_BLOOM_K))
    )
    assert row["n_members"] == len(members)
    assert row["n_probes"] == len(probes)
    assert row["n_bits_set"] == len(bits)
    assert abs(row["fill_ratio"] - len(bits) / _BLOOM_M) < 1e-6
    theory = (1 - math.exp(-_BLOOM_K * len(members) / _BLOOM_M)) ** _BLOOM_K
    assert abs(row["theory_fpr"] - theory) < 1e-5
    assert abs(row["empirical_fpr"] - fp / len(probes)) < 1e-6
    # the measurement should land in the right order of magnitude
    assert row["empirical_fpr"] <= 5 * max(row["theory_fpr"], 1e-4)


def test_supplier_entropy_definition(spark, sf_dir):
    rows = q_supplier_market_entropy(spark, sf_dir).collect()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
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
    scored = []
    for sk, grp in j.groupby("l_suppkey"):
        counts = Counter(grp.c_nationkey)
        n = sum(counts.values())
        h_e9 = sum(
            math.floor(1e9 * (c / n * math.log(n / c)) + 0.5)
            for c in counts.values()
        )
        scored.append((sk, n, len(counts), h_e9))
    scored.sort(key=lambda t: (-t[3], t[0]))
    assert len(rows) == 10
    for r, (sk, n, m, h_e9) in zip(rows, scored[:10]):
        assert r["suppkey"] == sk
        assert r["n_lines"] == n
        assert r["n_markets"] == m
        assert abs(r["entropy_nats"] - h_e9 / 1e9) < 1e-3
        assert abs(r["effective_markets"] - math.exp(h_e9 / 1e9)) < 0.02
        # effective markets bounded by the observed market count
        assert r["effective_markets"] <= r["n_markets"] + 1e-6


def test_birthday_definition(spark, sf_dir):
    row = q_birthday_collision_check(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select("o_custkey").toPandas()
    keys = set(o.o_custkey)
    buckets = Counter(
        int(hashlib.md5(str(k).encode()).hexdigest()[:4], 16) for k in keys
    )
    n = len(keys)
    obs = sum(c * (c - 1) // 2 for c in buckets.values())
    assert row["n_keys"] == n
    assert row["n_distinct_buckets"] == len(buckets)
    assert row["observed_collision_pairs"] == obs
    exp = n * (n - 1) / 2 / 65536
    assert abs(row["expected_collision_pairs"] - exp) < 0.02
    assert abs(row["obs_over_expected"] - obs / exp) < 1e-3
