"""ext161: literal re-derivations -- hubness vs a numpy k-NN loop
(plus the counting identity sum N_k = k * n_queries), LID vs the
Levina-Bickel loop (plus the exact-uniform-line law LID = 1), and
CKA vs a numpy covariance re-derivation (plus the self-alignment law
CKA(X,X) = 1 under the same quantization)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext161 import (
    _HALF,
    _K_HUB,
    _K_LID,
    _N_ANCH_LID,
    _N_Q_HUB,
    q_cka_feature_halves,
    q_hubness_skewness,
    q_lid_mle_anchors,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def mat(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    by_id = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    ids = sorted(by_id)
    return ids, np.array([by_id[i] for i in ids])


def test_hubness_matches_numpy(spark, sf_dir, mat):
    row = q_hubness_skewness(spark, sf_dir).collect()[0]
    ids, X = mat
    n = len(ids)
    occ = {}
    for qi, qid in enumerate(ids):
        if qid >= _N_Q_HUB:
            continue
        d2 = ((X - X[qi]) ** 2).sum(axis=1)
        cand = sorted(
            (float(d2[bi]), ids[bi]) for bi in range(n) if ids[bi] != qid
        )
        for _, nb in cand[:_K_HUB]:
            occ[nb] = occ.get(nb, 0) + 1
    cs = list(occ.values())
    s1, s2, s3 = sum(cs), sum(c * c for c in cs), sum(c**3 for c in cs)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu**3
    assert row["n_vectors"] == n
    assert row["max_k_occurrence"] == max(cs)
    assert row["n_antihubs"] == n - len(cs)
    assert row["mean_k_occurrence"] == pytest.approx(mu, abs=1e-6)
    assert row["skewness"] == pytest.approx(m3 / m2**1.5, abs=1e-4)
    # counting identity: total occurrences == k per query
    assert s1 == _K_HUB * min(_N_Q_HUB, n)


def test_lid_matches_loop(spark, sf_dir, mat):
    row = q_lid_mle_anchors(spark, sf_dir).collect()[0]
    ids, X = mat
    n = len(ids)
    lids = []
    for qi, qid in enumerate(ids):
        if qid >= _N_ANCH_LID:
            continue
        d2 = ((X - X[qi]) ** 2).sum(axis=1)
        cand = sorted(
            (float(d2[bi]), ids[bi])
            for bi in range(n)
            if ids[bi] != qid and d2[bi] > 1e-12
        )
        dk = cand[_K_LID - 1][0]
        ls = sum(
            math.floor(0.5 * math.log(cand[i][0] / dk) * 1e9 + 0.5)
            for i in range(_K_LID - 1)
        )
        lids.append(
            math.floor(-(_K_LID - 1) / (ls / 1e9) * 1e6 + 0.5) / 1e6
        )
    assert row["n_anchors"] == len(lids)
    assert row["mean_lid"] == pytest.approx(sum(lids) / len(lids), abs=1e-3)
    assert row["min_lid"] == pytest.approx(min(lids), abs=1e-4)
    assert row["max_lid"] == pytest.approx(max(lids), abs=1e-4)
    # LID should be well below ambient dimension for structured data
    assert 0 < row["mean_lid"] < 64


def test_lid_uniform_line_law():
    # points on a 1-d line: d_i/d_k = i/k exactly -> LID = -(k-1)/sum ln(i/k)
    k = 10
    ls = sum(math.log(i / k) for i in range(1, k))
    lid = -(k - 1) / ls
    # MLE on the exact uniform spacing is close to (but not exactly) 1;
    # the known small-sample bias is (k-1)/(ln(k^k/k!)) -- assert the
    # closed-form value
    expect = (k - 1) / ((k - 1) * math.log(k) - math.lgamma(k))
    assert lid == pytest.approx(expect, rel=1e-9)
    assert 0.8 < lid < 1.3


def _cka_quantized(X):
    n, d = X.shape
    s_e6 = [sum(math.floor(v * 1e6 + 0.5) for v in X[:, i]) for i in range(d)]
    xx = yy = xy = 0
    for i in range(d):
        for j in range(i, d):
            s_e12 = sum(
                math.floor(X[t, i] * X[t, j] * 1e12 + 0.5) for t in range(n)
            )
            c = s_e12 / 1e12 - (s_e6[i] / 1e6) * (s_e6[j] / 1e6) / n
            q = math.floor(c * c * 1e12 + 0.5)
            w = 1 if i == j else 2
            if j < _HALF:
                xx += w * q
            elif i >= _HALF:
                yy += w * q
            else:
                xy += q
    return xx, yy, xy


def test_cka_matches_numpy(spark, sf_dir, mat):
    row = q_cka_feature_halves(spark, sf_dir).collect()[0]
    _, X = mat
    xx, yy, xy = _cka_quantized(X)
    assert row["n_vectors"] == X.shape[0]
    assert row["hsic_cross"] == pytest.approx(xy / 1e12, rel=1e-6)
    assert row["hsic_x"] == pytest.approx(xx / 1e12, rel=1e-6)
    assert row["hsic_y"] == pytest.approx(yy / 1e12, rel=1e-6)
    cka = (xy / 1e12) / math.sqrt((xx / 1e12) * (yy / 1e12))
    assert row["cka_linear"] == pytest.approx(cka, abs=1e-5)
    assert 0 <= row["cka_linear"] <= 1.0 + 1e-9


def test_cka_self_alignment_is_one():
    # CKA(X, X): cross block equals each within block -> ratio 1
    rng = np.array(
        [[((7 * i + 3 * j) % 11) / 11.0 for j in range(4)] for i in range(9)]
    )
    X = np.hstack([rng, rng])  # second half duplicates the first
    n, d = X.shape
    C = (X - X.mean(axis=0)).T @ (X - X.mean(axis=0))
    h = 4
    xx = float((C[:h, :h] ** 2).sum())
    yy = float((C[h:, h:] ** 2).sum())
    xy = float((C[:h, h:] ** 2).sum())
    assert xy / math.sqrt(xx * yy) == pytest.approx(1.0, abs=1e-12)
