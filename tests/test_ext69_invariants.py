"""Definition-level checks for the ext69 batch."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext69 import (
    _JL_IN,
    _JL_OUT,
    _JL_PROBES,
    _JL_SIGNS,
    q_embedding_bucket_purity,
    q_jl_projection_distortion,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_jl_distortion_matches_literal_projection(spark, sf_dir):
    row = q_jl_projection_distortion(spark, sf_dir).collect()[0]
    emb = (
        read_table(spark, sf_dir, "embeddings")
        .where(f"vec_id < {_JL_PROBES}")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    vecs = {int(r.vec_id): np.array(r.embedding, dtype="float64") for r in emb.itertuples()}
    S = np.array(_JL_SIGNS, dtype="float64")  # OUT x IN
    ratios = []
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            diff = vecs[a] - vecs[b]
            d2 = float(diff @ diff)
            if d2 <= 0:
                continue
            proj = S @ diff
            p2 = float(proj @ proj) / _JL_OUT
            ratios.append(math.sqrt(p2 / d2))
    e9 = [int(math.floor(1e9 * r + 0.5)) for r in ratios]
    assert row["n_pairs"] == len(e9)
    assert abs(row["min_ratio"] - min(e9) / 1e9) < 2e-6
    assert abs(row["max_ratio"] - max(e9) / 1e9) < 2e-6
    assert abs(row["avg_ratio"] - sum(e9) / len(e9) / 1e9) < 2e-6
    assert row["n_within_30pct"] == sum(1 for r in e9 if 7e8 <= r <= 13e8)
    # the JL promise, empirically: mean distortion near 1, most pairs
    # inside the 30% band at m=16
    assert 0.8 < row["avg_ratio"] < 1.2
    assert row["n_within_30pct"] >= 0.8 * row["n_pairs"]


def test_bucket_purity_matches_literal_counts(spark, sf_dir):
    got = {r["bucket"]: r for r in q_embedding_bucket_purity(spark, sf_dir).collect()}
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).toPandas()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source").toPandas()
    src = dict(zip(docs.doc_id, docs.source))
    per = defaultdict(Counter)
    for r in emb.itertuples():
        if int(r.vec_id) not in src:
            continue
        b = sum((1 << k) for k in range(8) if r.embedding[k] > 0)
        per[b][src[int(r.vec_id)]] += 1
    assert set(got) == set(per)
    for b, counts in per.items():
        n_total = sum(counts.values())
        n_major = max(counts.values())
        majority = min(s for s, c in counts.items() if c == n_major)
        r = got[b]
        assert r["n_total"] == n_total
        assert r["n_major"] == n_major
        assert r["majority_source"] == majority
        assert r["purity_ppm"] == (1000000 * n_major) // n_total
        assert r["purity_ppm"] >= 1000000 // len(counts)
