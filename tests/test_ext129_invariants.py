"""ext129: literal numpy re-derivations of MRR and P@k from the dense
cosine matrix."""

from __future__ import annotations

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext129 import (
    _N_Q,
    _P_AT,
    q_mean_reciprocal_rank,
    q_precision_at_k_labels,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _ranking(spark, sf_dir):
    rows = read_table(spark, sf_dir, "embeddings").collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    v = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = {r["vec_id"]: r["label"] for r in rows}
    nv = v / np.linalg.norm(v, axis=1, keepdims=True)
    sim = np.round(nv @ nv.T, 6)
    idx = {vid: i for i, vid in enumerate(ids)}
    out = {}
    for q in [i for i in ids if i < _N_Q]:
        order = sorted(
            (o for o in ids if o != q), key=lambda o: (-sim[idx[q], idx[o]], o)
        )
        out[q] = order
    return out, labels


def test_mrr_matches_literal(spark, sf_dir):
    got = q_mean_reciprocal_rank(spark, sf_dir).collect()[0]
    ranking, labels = _ranking(spark, sf_dir)
    firsts = []
    for q, order in ranking.items():
        for rk, o in enumerate(order, start=1):
            if labels[o] == labels[q]:
                firsts.append(rk)
                break
    assert got["n_queries"] == len(firsts)
    assert got["n_hit_at_1"] == sum(1 for r in firsts if r == 1)
    mrr = sum(1.0 / r for r in firsts) / len(firsts)
    assert got["mrr"] == pytest.approx(mrr, abs=2e-6)
    assert 0.0 < got["mrr"] <= 1.0


def test_precision_at_k_matches_literal(spark, sf_dir):
    got = q_precision_at_k_labels(spark, sf_dir).collect()[0]
    ranking, labels = _ranking(spark, sf_dir)
    rel = sum(
        sum(1 for o in order[:_P_AT] if labels[o] == labels[q])
        for q, order in ranking.items()
    )
    assert got["n_queries"] == len(ranking)
    assert got["n_relevant_total"] == rel
    assert got["precision_at_k"] == pytest.approx(
        rel / (len(ranking) * _P_AT), abs=1e-6
    )
