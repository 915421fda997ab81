"""ext171: literal re-derivations -- Huffman vs a heapq reference
(plus the Shannon bounds H <= L < H+1 and the dyadic law L == H for
power-of-two weights), MATTR vs a window loop (plus the cyclic-text
law: MATTR is invariant to length for a periodic token stream while
raw TTR decays), and richness vs Counter (plus Guiraud's
self-consistency and the Honore undefined case)."""

from __future__ import annotations

import heapq
import math
from collections import Counter

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext171 import (
    _MAX_TOK,
    _N_DOCS,
    _W,
    q_huffman_code_length,
    q_mattr_sliding_ttr,
    q_richness_guiraud_honore,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _huffman_cost(weights):
    h = list(weights)
    heapq.heapify(h)
    cost = 0
    while len(h) > 1:
        a, b = heapq.heappop(h), heapq.heappop(h)
        cost += a + b
        heapq.heappush(h, a + b)
    return cost


def test_huffman_matches_heapq(spark, sf_dir):
    row = q_huffman_code_length(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    ws = [r["count"] for r in rows]
    tot = sum(ws)
    cost = _huffman_cost(ws)
    h = sum(
        math.floor(w * math.log2(tot / w) * 1e9 + 0.5) for w in ws
    ) / 1e9 / tot
    assert row["n_symbols"] == len(ws)
    assert row["total_weight"] == tot
    assert row["huffman_cost"] == cost
    assert row["expected_bits"] == pytest.approx(cost / tot, abs=1e-6)
    assert row["entropy_bits"] == pytest.approx(h, abs=1e-6)
    # Shannon bounds
    assert h - 1e-9 <= cost / tot < h + 1.0


def test_huffman_dyadic_and_bound_laws():
    # dyadic weights: optimal code meets entropy exactly
    ws = [1, 1, 2, 4, 8]
    tot = sum(ws)
    cost = _huffman_cost(ws)
    h = sum(w * math.log2(tot / w) for w in ws) / tot
    assert cost / tot == pytest.approx(h, abs=1e-12)
    # skewed non-dyadic: strictly inside (H, H+1)
    ws2 = [5, 1, 1]
    t2 = sum(ws2)
    h2 = sum(w * math.log2(t2 / w) for w in ws2) / t2
    l2 = _huffman_cost(ws2) / t2
    assert h2 < l2 < h2 + 1


@pytest.fixture(scope="module")
def doc_tokens(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    return rows


def test_mattr_matches_loop(spark, sf_dir, doc_tokens):
    row = q_mattr_sliding_ttr(spark, sf_dir).collect()[0]
    n_win = 0
    sv = 0
    pooled = Counter()
    n_tok = 0
    n_docs = set()
    for r in doc_tokens:
        if r["doc_id"] >= _N_DOCS:
            continue
        parts = r["text"].split(" ")[:_MAX_TOK]
        toks = [
            (i + 1, t.lower()) for i, t in enumerate(parts) if len(t) > 0
        ]
        for _, t in toks:
            pooled[t] += 1
            n_tok += 1
        if not toks:
            continue
        ln = max(p for p, _ in toks)
        if ln < _W:
            continue
        for i in range(1, ln - _W + 2):
            vs = {t for p, t in toks if i <= p < i + _W}
            if vs:
                n_win += 1
                sv += len(vs)
                n_docs.add(r["doc_id"])
    assert row["n_windows"] == n_win
    assert row["n_docs"] == len(n_docs)
    assert row["mattr_50"] == pytest.approx(sv / _W / n_win, abs=1e-6)
    assert row["raw_ttr_pooled"] == pytest.approx(
        len(pooled) / n_tok, abs=1e-6
    )


def test_mattr_cyclic_invariance_law():
    # periodic stream of period 10: every window of 50 sees 10 types,
    # regardless of total length; raw TTR decays with length
    def mattr(tokens, w):
        n = len(tokens)
        vals = [
            len(set(tokens[i : i + w])) for i in range(n - w + 1)
        ]
        return sum(vals) / w / len(vals)

    base = [f"t{i % 10}" for i in range(200)]
    longer = [f"t{i % 10}" for i in range(2000)]
    assert mattr(base, 50) == mattr(longer, 50)
    assert mattr(base, 50) == pytest.approx(10 / 50, abs=1e-12)
    assert len(set(longer)) / len(longer) < len(set(base)) / len(base)


def test_richness_matches_counter(spark, sf_dir, doc_tokens):
    got = {r["source"]: r for r in
           q_richness_guiraud_honore(spark, sf_dir).collect()}
    per = {}
    for r in doc_tokens:
        c = per.setdefault(r["source"], Counter())
        for t in r["text"].split(" "):
            if t:
                c[t.lower()] += 1
    assert set(got) == set(per)
    for src, cnt in per.items():
        n = sum(cnt.values())
        v = len(cnt)
        v1 = sum(1 for c in cnt.values() if c == 1)
        row = got[src]
        assert row["n_tokens"] == n
        assert row["vocab"] == v
        assert row["hapax"] == v1
        assert row["guiraud_r"] == pytest.approx(v / math.sqrt(n), abs=1e-3)
        assert row["brunet_w"] == pytest.approx(
            n ** (v**-0.165), rel=1e-4
        )
        if v1 < v:
            assert row["honore_h"] == pytest.approx(
                100 * math.log(n) / (1 - v1 / v), rel=1e-4
            )
        else:
            assert row["honore_h"] is None
