"""ext146: literal numpy re-derivations -- alignment/uniformity from
raw pair loops, TwoNN vs the sorted-distance definition, and the
participation ratio cross-checked against an ACTUAL eigensolve
(np.linalg.eigvalsh), which the query deliberately avoids."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext146 import (
    q_participation_ratio_embeddings,
    q_twonn_intrinsic_dim,
    q_uniformity_alignment,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    labels = {r["vec_id"]: r["label"] for r in rows}
    mat = np.array([[float(v) for v in r["embedding"]] for r in rows])
    return ids, labels, mat


def test_uniformity_alignment_matches_numpy(spark, sf_dir, vecs):
    ids, labels, mat = vecs
    row = q_uniformity_alignment(spark, sf_dir).collect()[0]
    idx = {v: k for k, v in enumerate(ids)}
    anchors = [v for v in ids if v < 20]
    pos_d2, all_u = [], []
    for a in anchors:
        xa = mat[idx[a]]
        for b in ids:
            if b == a:
                continue
            d2 = float(np.dot(xa - mat[idx[b]], xa - mat[idx[b]]))
            all_u.append(math.exp(-2.0 * d2))
            if labels[a] == labels[b]:
                pos_d2.append(d2)
    assert row["n_anchor_pairs"] == len(all_u)
    assert row["n_positive_pairs"] == len(pos_d2)
    assert row["alignment_l2sq"] == pytest.approx(
        sum(pos_d2) / len(pos_d2), abs=1e-5
    )
    assert row["uniformity_log"] == pytest.approx(
        math.log(sum(all_u) / len(all_u)), abs=1e-5
    )
    # laws: uniformity <= 0 (kernel <= 1); alignment >= 0
    assert row["uniformity_log"] <= 1e-9
    assert row["alignment_l2sq"] >= 0


def test_twonn_matches_sorted_distances(spark, sf_dir, vecs):
    ids, labels, mat = vecs
    row = q_twonn_intrinsic_dim(spark, sf_dir).collect()[0]
    idx = {v: k for k, v in enumerate(ids)}
    anchors = [v for v in ids if v < 50]
    lnmus = []
    for a in anchors:
        xa = mat[idx[a]]
        d2s = sorted(
            float(np.dot(xa - mat[idx[b]], xa - mat[idx[b]]))
            for b in ids
            if b != a
            and float(np.dot(xa - mat[idx[b]], xa - mat[idx[b]])) > 1e-12
        )
        lnmus.append(0.5 * math.log(d2s[1] / d2s[0]))
    assert row["n_anchors"] == len(lnmus)
    assert row["mean_ln_mu"] == pytest.approx(
        sum(lnmus) / len(lnmus), abs=1e-6
    )
    assert row["intrinsic_dim_twonn"] == pytest.approx(
        len(lnmus) / sum(lnmus), abs=1e-2
    )
    # 64-d unit embeddings with structure: ID must be positive and
    # can't exceed the ambient dimension by much
    assert 0 < row["intrinsic_dim_twonn"] < 128


def test_participation_ratio_matches_eigensolve(spark, sf_dir, vecs):
    ids, labels, mat = vecs
    row = q_participation_ratio_embeddings(spark, sf_dir).collect()[0]
    c = np.cov(mat, rowvar=False, bias=True)
    lam = np.linalg.eigvalsh(c)
    pr = float(lam.sum() ** 2 / (lam**2).sum())
    assert row["dim"] == 64
    assert row["trace_cov"] == pytest.approx(float(np.trace(c)), abs=1e-5)
    # tr(C^2) identity: sum of squared eigenvalues == sum C_ij^2
    assert row["participation_ratio"] == pytest.approx(pr, abs=2e-2)
    assert row["pr_fraction_of_dim"] == pytest.approx(pr / 64, abs=1e-3)
    assert 1 <= row["participation_ratio"] <= 64
