"""ext131: the carried-recursion streaming EWMA must equal a literal
sequential python recursion over per-user time-ordered purchases."""

from __future__ import annotations

from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext131 import (
    _ALPHA,
    q_streaming_ewma_replay,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table
from pyspark.sql import functions as F


def test_streaming_ewma_matches_sequential_recursion(spark, sf_dir):
    got = {
        r["user_id"]: (r["n_purchases"], r["ewma_value"])
        for r in q_streaming_ewma_replay(spark, sf_dir).collect()
    }
    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "value", F.unix_micros("ts").alias("us"), "event_id")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r["user_id"]].append((r["us"], r["event_id"], r["value"]))
    assert set(got) == set(per)
    for u, rows in per.items():
        rows.sort()
        s = rows[0][2]
        for _, _, x in rows[1:]:
            s = _ALPHA * x + (1 - _ALPHA) * s
        n, ewma = got[u]
        assert n == len(rows)
        assert ewma == pytest.approx(s, abs=2e-6)
    # the carried fold crossed at least one batch boundary for most
    # keys (4 batches over the whole stream)
    assert len(got) > 0
