"""Definition-level invariants for ext230 (adaptive arithmetic
coding)."""

from __future__ import annotations

import random

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
    _AC_QUARTER,
    ac_decode_bits,
    ac_encode_bits,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

_Q = {q.name: q.fn for q in registry()}


def test_ac_roundtrip_fuzz():
    rng = random.Random(23)
    for _ in range(150):
        n = rng.randint(1, 500)
        p = rng.choice([0.05, 0.2, 0.5, 0.7, 0.99])
        bits = [1 if rng.random() < p else 0 for _ in range(n)]
        data, n_out, _ = ac_encode_bits(bits)
        assert ac_decode_bits(data, n) == bits


def test_ac_flush_accounting():
    """The trace's flush arithmetic (the SQL oracle's closing CASE)
    reproduces the real bit count on arbitrary inputs."""
    rng = random.Random(29)
    for _ in range(100):
        bits = [rng.randint(0, 1) for _ in range(rng.randint(1, 300))]
        data, n_out, trace = ac_encode_bits(bits)
        n_emitted, ones, low, high, pending, c0, c1 = trace
        assert n_out == n_emitted + pending + 2
        total_ones = sum(
            (data[i >> 3] >> (7 - (i & 7))) & 1 for i in range(n_out)
        )
        expect_ones = ones + (pending + 1 if low < _AC_QUARTER else 1)
        assert total_ones == expect_ones


def test_ac_compresses_biased_not_balanced():
    rng = random.Random(31)
    biased = [1 if rng.random() < 0.95 else 0 for _ in range(2000)]
    _, n_b, _ = ac_encode_bits(biased)
    assert n_b < 2000 * 0.5  # H(0.95) ~ 0.29 bits
    balanced = [rng.randint(0, 1) for _ in range(2000)]
    _, n_u, _ = ac_encode_bits(balanced)
    assert 2000 * 0.95 < n_u < 2000 * 1.1
    constant = [1] * 2000
    _, n_c, _ = ac_encode_bits(constant)
    assert n_c < 40  # adaptive model locks on


def test_ac_counts_are_adaptive_model_totals():
    bits = [1, 0, 0, 1, 1, 1, 0]
    _, _, trace = ac_encode_bits(bits)
    *_, c0, c1 = trace
    assert c0 == 1 + bits.count(0)
    assert c1 == 1 + bits.count(1)


def test_ac_query_matches_python(spark, sf_dir):
    bits = [
        int(r[0])
        for r in duckdb.sql(
            f"""
            WITH daily AS (
              SELECT o_orderdate d,
                     CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                          AS BIGINT) cents
              FROM '{sf_dir}/orders.parquet' GROUP BY 1),
            b AS (SELECT CASE WHEN cents > lag(cents) OVER (ORDER BY d)
                              THEN 1 ELSE 0 END b,
                         row_number() OVER (ORDER BY d) rn FROM daily)
            SELECT b FROM b WHERE rn > 1 ORDER BY rn
            """
        ).fetchall()
    ]
    data, n_out, trace = ac_encode_bits(bits)
    n_emitted, ones, low, high, pending, c0, c1 = trace
    row = _Q["arith_coder_daily"](spark, sf_dir).collect()[0]
    assert row["n_bits_in"] == len(bits)
    assert row["n_bits_out"] == n_out
    assert row["ratio_ppm"] == n_out * 10**6 // len(bits)
    assert row["final_c0"] == c0 and row["final_c1"] == c1
    assert row["final_low"] == low
    assert row["final_pending"] == pending
