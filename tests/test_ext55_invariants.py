"""Definition-level checks for the ext55 batch."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext55 import (
    q_cluster_size_histogram,
    q_share_cascade,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_cluster_histogram_matches_bfs_components(spark, sf_dir):
    got = q_cluster_size_histogram(spark, sf_dir).toPandas().set_index("cluster_size")
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id").toPandas()
    sigs = minhash_signatures(
        read_table(spark, sf_dir, "documents"), "doc_id", "text", n_hashes=8, shingle_w=3
    )
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2).toPandas()
    adj = defaultdict(set)
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    seen = set()
    sizes = []
    for d in docs.doc_id:
        if d in seen:
            continue
        stack, comp = [d], set()
        while stack:
            cur = stack.pop()
            if cur in comp:
                continue
            comp.add(cur)
            stack.extend(adj.get(cur, ()))
        seen |= comp
        sizes.append(len(comp))
    hist = Counter(sizes)
    assert {int(k): int(v.n_clusters) for k, v in got.iterrows()} == dict(hist)
    # every doc is accounted for exactly once
    assert int(got.n_docs.sum()) == len(docs)


def test_share_cascade_multiplies_back_to_global(spark, sf_dir):
    got = q_share_cascade(spark, sf_dir).toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").toPandas()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey").toPandas()
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey").toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    df["s"] = np.round(df.o_totalprice * 100).astype("int64")
    spend = df.groupby(["c_custkey", "n_nationkey", "n_regionkey"]).s.sum()
    nation_s = spend.groupby(level=1).sum()
    region_s = spend.groupby(level=2).sum()
    total = int(spend.sum())
    for r in got.head(300).itertuples():
        s = int(spend.loc[(r.c_custkey, r.nationkey, r.regionkey)])
        assert int(r.spend_cents) == s
        assert int(r.share_of_nation_ppm) == (1000000 * s) // int(nation_s[r.nationkey])
        assert int(r.nation_share_of_region_ppm) == (
            1000000 * int(nation_s[r.nationkey])
        ) // int(region_s[r.regionkey])
        assert int(r.region_share_ppm) == (1000000 * int(region_s[r.regionkey])) // total
        # cascade identity within floor error (3 floors of 1e-6 each)
        global_ppm = (1000000 * s) // total
        cascade = (
            (r.share_of_nation_ppm / 1e6)
            * (r.nation_share_of_region_ppm / 1e6)
            * (r.region_share_ppm / 1e6)
        ) * 1e6
        assert abs(cascade - global_ppm) <= 3
