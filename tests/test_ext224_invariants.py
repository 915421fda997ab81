"""Definition-level invariants for ext224 (Rice codec, Kneser-Ney,
power-iteration stationary distribution): independent re-derivations
in pure Python/Fractions/numpy -- the shared-formulation-bug class the
oracle cannot catch.
"""

from __future__ import annotations

import itertools
import math
import random
from fractions import Fraction

import duckdb
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
    decode_rice,
    encode_rice,
    rice_pick_k,
    rice_zigzag,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

_Q = {q.name: q.fn for q in registry()}


# ---------------------------------------------------------------------------
# Rice codec
# ---------------------------------------------------------------------------
def test_rice_roundtrip_fuzz():
    rng = random.Random(20260816)
    for _ in range(300):
        n = rng.randint(1, 90)
        s = [
            rng.randint(-32768, 32767)
            if rng.random() < 0.25
            else rng.randint(-50, 50)
            for _ in range(n)
        ]
        assert decode_rice(encode_rice(s), n) == s


def test_rice_roundtrip_edges():
    for s in (
        [0],
        [0] * 128,
        [32767, -32768] * 16,
        [-1],
        list(range(-64, 64)),
    ):
        assert decode_rice(encode_rice(s), len(s)) == s


def test_rice_pick_k_is_argmin():
    z = rice_zigzag([3, -7, 120, 0, 0, 5, -2, 4000])
    k, bits, mu = rice_pick_k(z)
    table = {kk: sum((v >> kk) + 1 + kk for v in z) for kk in range(16)}
    assert bits == min(table.values())
    assert k == min(kk for kk, b in table.items() if b == bits)
    assert mu == max(v >> k for v in z)


def test_rice_bitstream_literal():
    # one sample, d=3 => zigzag 6; k scan: k=0 costs 7 bits, k=1 costs
    # 5, k=2 costs 4, k=3 costs 4 -> k=2 wins (smallest-k tie at 4 is
    # k=2). Stream: header 0x02, then unary '1'+'0' and remainder '10'
    # => bits 1010 -> byte 0xA0.
    data = encode_rice([3])
    assert data == bytes([2, 0b10100000])
    assert decode_rice(data, 1) == [3]


def test_rice_truncated_stream_raises():
    data = encode_rice([100, -200, 300])
    with pytest.raises(ValueError):
        decode_rice(data[:-1], 3)
    with pytest.raises(ValueError):
        decode_rice(b"", 1)


def test_rice_compresses_smooth_walk():
    walk = list(itertools.accumulate([((i * 37) % 16) - 8 for i in range(200)]))
    assert len(encode_rice(walk)) < 200 * 2 / 2  # better than 2x


# ---------------------------------------------------------------------------
# Kneser-Ney
# ---------------------------------------------------------------------------
def _bigram_counts(sf_dir: str):
    rows = duckdb.sql(
        f"""
        SELECT w1, w2, count(*) AS c FROM (
          SELECT event_type AS w1,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY event_id) AS w2
          FROM '{sf_dir}/events.parquet')
        WHERE w2 IS NOT NULL GROUP BY w1, w2
        """
    ).fetchall()
    return {(r[0], r[1]): int(r[2]) for r in rows}


def test_kneser_ney_matches_fraction_rederivation(spark, sf_dir):
    bg = _bigram_counts(sf_dir)
    c1 = {}
    n1w = {}
    ncont = {}
    for (w1, w2), c in bg.items():
        c1[w1] = c1.get(w1, 0) + c
        n1w[w1] = n1w.get(w1, 0) + 1
        ncont[w2] = ncont.get(w2, 0) + 1
    t = len(bg)
    got = {
        (r["w1"], r["w2"]): r
        for r in _Q["kneser_ney_bigrams"](spark, sf_dir).collect()
    }
    assert set(got) == set(bg)
    for (w1, w2), r in got.items():
        c = bg[(w1, w2)]
        p = Fraction(max(4 * c - 3, 0), 4 * c1[w1]) + Fraction(
            3 * n1w[w1], 4 * c1[w1]
        ) * Fraction(ncont[w2], t)
        assert r["bigram_count"] == c
        assert r["prob_kn_e9"] == int(p * 10**9), (w1, w2)


def test_kneser_ney_sums_to_one_exactly(sf_dir, spark):
    """Interpolated KN is a proper distribution: for every w1 the
    full-vocabulary probability sum is EXACTLY 1 (in Fractions, using
    the backoff-only term for unseen continuations)."""
    bg = _bigram_counts(sf_dir)
    vocab = sorted({w for pair in bg for w in pair})
    c1 = {}
    n1w = {}
    ncont = {}
    for (w1, w2), c in bg.items():
        c1[w1] = c1.get(w1, 0) + c
        n1w[w1] = n1w.get(w1, 0) + 1
        ncont[w2] = ncont.get(w2, 0) + 1
    t = len(bg)
    assert sum(ncont.values()) == t
    for w1 in vocab:
        if w1 not in c1:
            continue
        tot = Fraction(0)
        for w2 in vocab:
            c = bg.get((w1, w2), 0)
            tot += Fraction(max(4 * c - 3, 0), 4 * c1[w1]) + Fraction(
                3 * n1w[w1], 4 * c1[w1]
            ) * Fraction(ncont.get(w2, 0), t)
        assert tot == 1, w1


# ---------------------------------------------------------------------------
# Markov stationary distribution
# ---------------------------------------------------------------------------
def test_stationary_matches_numpy_power(spark, sf_dir):
    import numpy as np

    bg = _bigram_counts(sf_dir)
    states = ["click", "error", "purchase", "signup", "view"]
    idx = {s: i for i, s in enumerate(states)}
    cm = np.zeros((5, 5))
    for (w1, w2), c in bg.items():
        cm[idx[w1], idx[w2]] = c
    p = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1)
    v = np.full(5, 0.2) @ np.linalg.matrix_power(p, 40)
    got = {
        r["state"]: r
        for r in _Q["markov_stationary_distribution"](spark, sf_dir).collect()
    }
    assert len(got) == 5
    for s in states:
        # numpy matmul associates differently -- ulp-level tolerance
        assert got[s]["pi_e9"] == pytest.approx(
            math.floor(v[idx[s]] * 1e9 + 0.5), abs=3
        ), s
    assert abs(sum(r["pi_e9"] for r in got.values()) - 10**9) <= 3
    for r in got.values():
        assert r["delta_e12"] < 10**7  # converged well before 40 rounds
    ranks = sorted(got.values(), key=lambda r: r["pi_rank"])
    assert all(
        a["pi_e9"] >= b["pi_e9"] for a, b in zip(ranks, ranks[1:])
    )
