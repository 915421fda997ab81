"""Definition-level checks for the ext60 batch."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext60 import (
    q_brand_price_premium,
    q_hapax_ratio,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_hapax_matches_literal_spectrum(spark, sf_dir):
    got = q_hapax_ratio(spark, sf_dir).toPandas().set_index("source")
    docs = read_table(spark, sf_dir, "documents").select("source", "text").toPandas()
    for src, g in docs.groupby("source"):
        counts = Counter(t for text in g.text for t in text.split(" "))
        hapax = sum(1 for c in counts.values() if c == 1)
        dis = sum(1 for c in counts.values() if c == 2)
        row = got.loc[src]
        assert int(row.n_types) == len(counts)
        assert int(row.n_hapax) == hapax
        assert int(row.n_dis_legomena) == dis
        assert int(row.hapax_ppm) == (1000000 * hapax) // len(counts)


def test_brand_premium_matches_literal_peer_baseline(spark, sf_dir):
    got = q_brand_price_premium(spark, sf_dir).toPandas().set_index("brand")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    ).toPandas()
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    ).toPandas()
    df = li[li.l_quantity > 0].merge(p, left_on="l_partkey", right_on="p_partkey")
    # HALF-UP like the engines (np.round is banker's/half-even)
    df["unit"] = np.floor(100 * df.l_extendedprice / df.l_quantity + 0.5).astype("int64")
    peer = df.groupby(["p_type", "p_size"]).unit.agg(["size", "sum"])
    peer_e3 = {k: (1000 * int(v["sum"])) // int(v["size"]) for k, v in peer.iterrows()}
    for brand, g in df.groupby("p_brand"):
        n = len(g)
        s = int(g.unit.sum())
        pe_sum = sum(peer_e3[(t, z)] for t, z in zip(g.p_type, g.p_size))
        row = got.loc[brand]
        assert int(row.n_lines) == n
        assert int(row.brand_unit_e3) == (1000 * s) // n
        assert int(row.peer_unit_e3) == pe_sum // n
        assert int(row.premium_e3) == (1000 * s) // n - pe_sum // n
    # premiums vs the market average roughly balance out across brands
    w = (got.premium_e3 * got.n_lines).sum() / got.n_lines.sum()
    assert abs(w) < 2000  # < $2 of aggregate drift from floor rounding
