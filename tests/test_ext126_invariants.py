"""ext126: the streaming Bloom fold must equal a literal python Bloom
build (md5 positions, k=3, m=65536) probed the same way."""

from __future__ import annotations

import hashlib

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext106 import (
    _BLOOM_K,
    _BLOOM_M,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext126 import (
    q_streaming_bloom_replay,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _positions(key):
    h = hashlib.md5(str(key).encode()).hexdigest()
    return [int(h[4 * i : 4 * i + 4], 16) % _BLOOM_M for i in range(_BLOOM_K)]


def test_streaming_bloom_matches_python_build(spark, sf_dir):
    got = q_streaming_bloom_replay(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    members = {r["user_id"] for r in ev if r["event_type"] == "purchase"}
    signups = {r["user_id"] for r in ev if r["event_type"] == "signup"}
    probes = signups - members
    bits = {p for m in members for p in _positions(m)}
    fps = sum(1 for u in probes if all(p in bits for p in _positions(u)))
    assert got["n_members"] == len(members)
    assert got["n_bits_set"] == len(bits)
    assert got["n_probes"] == len(probes)
    assert got["n_false_positives"] == fps
    # structural guarantees of the fold
    assert got["n_bits_set"] <= min(_BLOOM_M, _BLOOM_K * got["n_members"])
    assert 0 <= got["n_false_positives"] <= got["n_probes"]
