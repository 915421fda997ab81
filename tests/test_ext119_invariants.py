"""ext119: literal python re-derivations -- Katz via dense walk
counting, harmonic via BFS, Stupid Backoff via dict counting."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext119 import (
    _HELD_OUT,
    _KATZ_ALPHA,
    _KATZ_K,
    _SB_LAMBDA,
    _near_dup_edges,
    q_harmonic_centrality_3hop,
    q_katz_centrality,
    q_stupid_backoff_heldout,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _adj(spark, sf_dir):
    edges = _near_dup_edges(spark, sf_dir).collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r["a"]].add(r["b"])
    return adj


def test_katz_matches_walk_counting(spark, sf_dir):
    adj = _adj(spark, sf_dir)
    got = {r["node"]: r for r in q_katz_centrality(spark, sf_dir).collect()}
    assert set(got) == set(adj)
    w = {v: 1 for v in adj}
    expected = {v: 0.0 for v in adj}
    walks_last = {}
    for k in range(1, _KATZ_K + 1):
        nw = {v: 0 for v in adj}
        for a, nbrs in adj.items():
            for b in nbrs:
                nw[b] += w.get(a, 0)
        w = nw
        for v in adj:
            expected[v] += _KATZ_ALPHA**k * w[v]
        walks_last = dict(w)
    for v, r in got.items():
        assert r["degree"] == len(adj[v])
        assert r[f"walks_{_KATZ_K}"] == walks_last[v]
        assert r["katz"] == pytest.approx(expected[v], abs=2e-6)


def test_harmonic_matches_bfs(spark, sf_dir):
    adj = _adj(spark, sf_dir)
    got = {r["node"]: r for r in q_harmonic_centrality_3hop(spark, sf_dir).collect()}
    assert set(got) == set(adj)
    for src in adj:
        dist = {src: 0}
        frontier = [src]
        for d in (1, 2, 3):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        n = Counter(dist.values())
        r = got[src]
        assert (r["n1"], r["n2"], r["n3"]) == (n[1], n[2], n[3])
        assert r["harmonic3"] == pytest.approx(
            n[1] + n[2] / 2 + n[3] / 3, abs=1e-6
        )


def test_stupid_backoff_matches_dict_counts(spark, sf_dir):
    got = q_stupid_backoff_heldout(spark, sf_dir).collect()[0]
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    train = [r["text"].split(" ") for r in docs if r["source"] != _HELD_OUT]
    test = [r["text"].split(" ") for r in docs if r["source"] == _HELD_OUT]
    uni, bi, tri = Counter(), Counter(), Counter()
    n = 0
    for t in train:
        n += len(t)
        uni.update(t)
        bi.update(zip(t, t[1:]))
        tri.update(zip(t, t[1:], t[2:]))
    v = len(uni)
    lvls = Counter()
    logsum = 0.0
    cnt = 0
    for t in test:
        for g in zip(t, t[1:], t[2:]):
            cnt += 1
            if tri[g] > 0:
                s = tri[g] / bi[(g[0], g[1])]
                lvls[0] += 1
            elif bi[(g[1], g[2])] > 0:
                s = _SB_LAMBDA * bi[(g[1], g[2])] / uni[g[1]]
                lvls[1] += 1
            else:
                s = _SB_LAMBDA**2 * (uni[g[2]] + 1) / (n + v)
                lvls[2] += 1
            logsum += math.log(s)
    assert got["n_trigrams"] == cnt
    assert got["n_direct"] == lvls[0]
    assert got["n_bigram_backoff"] == lvls[1]
    assert got["n_unigram_backoff"] == lvls[2]
    # held-out scoring must actually exercise the backoff ladder
    assert lvls[1] + lvls[2] > 0
    assert got["avg_log_score"] == pytest.approx(logsum / cnt, abs=2e-6)
