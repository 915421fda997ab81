"""ext124: literal numpy re-derivations -- triplet mining via a dense
similarity matrix, label coherence via the ACTUAL pairwise mean (the
identity check), MMR via a sequential greedy loop."""

from __future__ import annotations

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext124 import (
    _MMR_K,
    _MMR_LAMBDA,
    _MMR_MU,
    _MMR_POOL,
    _N_ANCHORS,
    q_hard_negative_mining,
    q_label_coherence_score,
    q_mmr_rerank,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _vectors(spark, sf_dir):
    rows = read_table(spark, sf_dir, "embeddings").collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    v = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = {r["vec_id"]: r["label"] for r in rows}
    return ids, v, labels


def _cos_matrix(v):
    nv = v / np.linalg.norm(v, axis=1, keepdims=True)
    return nv @ nv.T


def test_hard_negatives_match_dense_argmax(spark, sf_dir):
    got = {r["anchor_id"]: r for r in q_hard_negative_mining(spark, sf_dir).collect()}
    ids, v, labels = _vectors(spark, sf_dir)
    sim = np.round(_cos_matrix(v), 6)
    idx = {vid: i for i, vid in enumerate(ids)}
    for a in [i for i in ids if i < _N_ANCHORS]:
        ai = idx[a]
        best = {}
        for kind, pred in (
            ("neg", lambda o: labels[o] != labels[a]),
            ("pos", lambda o: labels[o] == labels[a]),
        ):
            cands = [
                (-sim[ai, idx[o]], o) for o in ids if o != a and pred(o)
            ]
            cands.sort()
            best[kind] = cands[0]
        r = got[a]
        assert (r["hard_neg_id"], r["neg_cosine"]) == (
            best["neg"][1],
            pytest.approx(-best["neg"][0], abs=1e-6),
        )
        assert (r["hard_pos_id"], r["pos_cosine"]) == (
            best["pos"][1],
            pytest.approx(-best["pos"][0], abs=1e-6),
        )
        assert r["margin"] == pytest.approx(
            r["pos_cosine"] - r["neg_cosine"], abs=2e-6
        )


def test_label_coherence_matches_actual_pairwise_mean(spark, sf_dir):
    got = {r["label"]: r for r in q_label_coherence_score(spark, sf_dir).collect()}
    ids, v, labels = _vectors(spark, sf_dir)
    sim = _cos_matrix(v)
    idx = {vid: i for i, vid in enumerate(ids)}
    by_label = {}
    for vid in ids:
        by_label.setdefault(labels[vid], []).append(idx[vid])
    gsum = v.sum(axis=0)
    for lab, members in by_label.items():
        r = got[lab]
        assert r["n"] == len(members)
        pair = [
            sim[i, j] for i in members for j in members if i != j
        ]
        # the centroid-norm identity vs the ACTUAL O(n^2) pairwise mean
        assert r["mean_intra_cosine"] == pytest.approx(
            float(np.mean(pair)), abs=5e-5
        )
        c = v[members].sum(axis=0)
        want = float(c @ gsum / (np.linalg.norm(c) * np.linalg.norm(gsum)))
        assert r["centroid_vs_global_cos"] == pytest.approx(want, abs=5e-5)


def test_mmr_matches_sequential_greedy(spark, sf_dir):
    got = sorted(
        (r["position"], r["vec_id"], r["relevance"])
        for r in q_mmr_rerank(spark, sf_dir).collect()
    )
    ids, v, labels = _vectors(spark, sf_dir)
    idx = {vid: i for i, vid in enumerate(ids)}
    sim = _cos_matrix(v)
    rel = {
        o: round(1e6 * sim[idx[0], idx[o]]) for o in ids if o != 0
    }
    pool = sorted(rel, key=lambda o: (-rel[o], o))[:_MMR_POOL]
    pair = {
        (a, b): round(1e6 * sim[idx[a], idx[b]])
        for a in pool
        for b in pool
        if a != b
    }
    sel = [min(pool, key=lambda o: (-rel[o], o))]
    for _ in range(_MMR_K - 1):
        remaining = [o for o in pool if o not in sel]
        scores = {
            o: round(
                _MMR_LAMBDA * rel[o]
                - _MMR_MU * max(pair[(o, s)] for s in sel)
            )
            for o in remaining
        }
        sel.append(min(remaining, key=lambda o: (-scores[o], o)))
    want = sorted(
        (k + 1, o, pytest.approx(rel[o] / 1e6, abs=2e-6))
        for k, o in enumerate(sel)
    )
    assert [(p, vid) for p, vid, _ in got] == [(p, vid) for p, vid, _ in want]
    for (_, _, g), (_, _, w) in zip(got, want):
        assert g == w
    assert len(got) == _MMR_K
