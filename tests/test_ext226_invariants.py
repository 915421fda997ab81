"""Definition-level invariants for ext226 (Johnson scheduling, AML
round-trips, LZ76, CRC-32)."""

from __future__ import annotations

import itertools
import random
import zlib

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext226 import (
    _CRC_MASK,
    _CRC_POLY,
    lz76_count,
)

_Q = {q.name: q.fn for q in registry()}


# ---------------------------------------------------------------------------
# Johnson two-machine
# ---------------------------------------------------------------------------
def _makespan(seq):
    m1 = m2 = 0
    for t1, t2 in seq:
        m1 += t1
        m2 = max(m2, m1) + t2
    return m2


def _johnson_order(jobs):
    a = sorted(
        [j for j in jobs if j[1] < j[2]], key=lambda j: (j[1], j[0])
    )
    b = sorted(
        [j for j in jobs if j[1] >= j[2]], key=lambda j: (-j[2], j[0])
    )
    return a + b


def test_johnson_rule_is_optimal_on_planted_instance():
    rng = random.Random(42)
    for _ in range(20):
        jobs = [
            (k, rng.randint(1, 9), rng.randint(1, 9)) for k in range(7)
        ]
        best = min(
            _makespan([(t1, t2) for _, t1, t2 in perm])
            for perm in itertools.permutations(jobs)
        )
        got = _makespan([(t1, t2) for _, t1, t2 in _johnson_order(jobs)])
        assert got == best


def test_johnson_query_matches_python_fold(spark, sf_dir):
    rows = _Q["johnson_two_machine"](spark, sf_dir).collect()
    by_policy = {}
    for r in rows:
        by_policy.setdefault(r["policy"], []).append(r)
    assert set(by_policy) == {"johnson", "fifo"}
    for policy, rs in by_policy.items():
        rs.sort(key=lambda r: r["seq"])
        m1 = m2 = 0
        for r in rs:
            m1 += r["t1"]
            m2 = max(m2, m1) + r["t2"]
            assert r["machine1_done"] == m1, (policy, r["seq"])
            assert r["machine2_done"] == m2, (policy, r["seq"])
        assert all(r["t1"] >= 1 and r["t2"] >= 1 for r in rs)
    # the Johnson schedule orders the same job SET
    assert sorted(r["part"] for r in by_policy["johnson"]) == sorted(
        r["part"] for r in by_policy["fifo"]
    )
    # optimality on the real instance: johnson <= fifo
    assert max(r["machine2_done"] for r in by_policy["johnson"]) <= max(
        r["machine2_done"] for r in by_policy["fifo"]
    )
    # and it matches the rule applied in Python
    jobs = [(r["part"], r["t1"], r["t2"]) for r in by_policy["fifo"]]
    expected = [p for p, _, _ in _johnson_order(jobs)]
    assert [r["part"] for r in by_policy["johnson"]] == expected


# ---------------------------------------------------------------------------
# Round-trip payments
# ---------------------------------------------------------------------------
def test_round_trips_match_duckdb_enumeration(spark, sf_dir):
    got = [
        (r["origin"], r["middle"], r["n_round_trips"])
        for r in _Q["round_trip_payments"](spark, sf_dir).collect()
    ]
    exp = duckdb.sql(
        f"""
        WITH e AS (
          SELECT user_id,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS benef,
                 epoch_us(ts) AS us,
                 CAST(round(value * 100, 0) AS BIGINT) AS cents
          FROM '{sf_dir}/events.parquet')
        SELECT a.user_id, a.benef, CAST(count(*) AS BIGINT)
        FROM e a JOIN e b
          ON b.user_id = a.benef AND b.benef = a.user_id
         AND b.us > a.us AND b.us <= a.us + 604800000000
         AND 10 * b.cents BETWEEN 8 * a.cents AND 12 * a.cents
        GROUP BY 1, 2 ORDER BY 3 DESC, 1, 2 LIMIT 10
        """
    ).fetchall()
    assert got == [tuple(r) for r in exp]


# ---------------------------------------------------------------------------
# LZ76
# ---------------------------------------------------------------------------
def test_lz76_textbook_values():
    assert lz76_count("") == 0
    assert lz76_count("0") == 1
    assert lz76_count("01") == 2
    assert lz76_count("aaaa") == 2
    # Kaspar-Schuster's worked example
    assert lz76_count("1001111011000010") == 6
    # constant sequences stay at 2 regardless of length
    assert lz76_count("1" * 500) == 2
    # alternating saturates at 3: 0|1|0101...
    assert lz76_count("01" * 250) == 3


def test_lz76_random_sequence_near_limit():
    import math

    rng = random.Random(7)
    s = "".join(rng.choice("01") for _ in range(2048))
    c = lz76_count(s)
    limit = len(s) / math.log2(len(s))
    assert 0.6 * limit < c < 1.4 * limit


def test_lz76_query_matches_fold(spark, sf_dir):
    bits = duckdb.sql(
        f"""
        WITH daily AS (
          SELECT o_orderdate AS d,
                 CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                      AS BIGINT) AS cents
          FROM '{sf_dir}/orders.parquet' GROUP BY o_orderdate),
        b AS (
          SELECT CASE WHEN cents > lag(cents) OVER (ORDER BY d)
                      THEN '1' ELSE '0' END AS b,
                 row_number() OVER (ORDER BY d) AS rn
          FROM daily)
        SELECT string_agg(b, '' ORDER BY rn) FROM b WHERE rn > 1
        """
    ).fetchone()[0]
    row = _Q["lz76_complexity"](spark, sf_dir).collect()[0]
    assert row["n_bits"] == len(bits)
    assert row["c_components"] == lz76_count(bits)
    assert row["compression_ppm"] == lz76_count(bits) * 10**6 // len(bits)


# ---------------------------------------------------------------------------
# CRC-32
# ---------------------------------------------------------------------------
def _crc32_bitwise(data: bytes) -> int:
    crc = _CRC_MASK
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (_CRC_POLY if crc & 1 else 0)
    return crc ^ _CRC_MASK


def test_crc32_check_value():
    # THE standard CRC-32 check vector
    assert zlib.crc32(b"123456789") & _CRC_MASK == 0xCBF43926
    assert _crc32_bitwise(b"123456789") == 0xCBF43926


def test_crc32_bitwise_matches_zlib_fuzz():
    rng = random.Random(11)
    for _ in range(100):
        data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 80)))
        assert _crc32_bitwise(data) == zlib.crc32(data) & _CRC_MASK


def test_crc32_query_rows(spark, sf_dir):
    rows = _Q["crc32_media"](spark, sf_dir).collect()
    assert all(r["n_bytes"] == 60 for r in rows)
    assert all(0 <= r["crc32"] <= _CRC_MASK for r in rows)
    # spot-check one media against the independent bitwise mirror
    import hashlib

    r0 = min(rows, key=lambda r: r["media_id"])
    d = str(r0["media_id"])
    content = bytes.fromhex(
        "".join(
            hashlib.md5((d + suf).encode()).hexdigest() for suf in "abcd"
        )
    )[:60]
    assert r0["crc32"] == _crc32_bitwise(content)


def test_crc_seeded_continuation_equals_one_shot():
    """The replay's carried-state contract: zlib.crc32(b, crc32(a)) ==
    crc32(a + b) for arbitrary cuts -- the multipart-upload law."""
    rng = random.Random(3)
    for _ in range(50):
        data = bytes(rng.randrange(256) for _ in range(60))
        cut1, cut2 = sorted(rng.sample(range(61), 2))
        c = zlib.crc32(data[:cut1])
        c = zlib.crc32(data[cut1:cut2], c)
        c = zlib.crc32(data[cut2:], c)
        assert c & _CRC_MASK == zlib.crc32(data) & _CRC_MASK


def test_streaming_crc_replay_equals_one_shot(spark, sf_dir):
    a = sorted(
        map(tuple, _Q["crc32_media"](spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, _Q["streaming_crc_replay"](spark, sf_dir).collect())
    )
    assert a == b
