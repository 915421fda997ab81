"""Invariants for ext219: the boundary-stitch property of the
transition replay (total transitions = total events - distinct users;
replay == direct batch lag), and the split-reconstruction screen's
definitional laws re-derived in python."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_Q = {q.name: q.fn for q in registry()}


def test_transition_replay_equals_batch_lag(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    want = defaultdict(int)
    for rows in by_user.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            want[(a, b)] += 1
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in _Q["streaming_transition_replay"](spark, sf_dir).collect()
    }
    assert got == dict(want)
    # conservation: every event except each user's first is a target
    assert sum(got.values()) == len(ev) - len(by_user)


def test_transition_row_shares_sum_to_one(spark, sf_dir):
    rows = _Q["streaming_transition_replay"](spark, sf_dir).collect()
    by_from = defaultdict(float)
    for r in rows:
        by_from[r["from_type"]] += r["row_share"]
    for v in by_from.values():
        assert v == pytest.approx(1.0, abs=1e-4)


def test_split_reconstruction_matches_python(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("c"),
    ).collect()
    cells = defaultdict(list)
    for r in ev:
        cells[(r["user_id"], r["d"])].append((r["event_id"], r["c"]))
    n_pairs = n_round = 0
    hits = []
    for (u, d), rows in cells.items():
        rows.sort()
        for i, (ka, ca) in enumerate(rows):
            for kb, cb in rows[i + 1 :]:
                n_pairs += 1
                tot = ca + cb
                if tot % 1000 == 0 and ca % 1000 and cb % 1000:
                    n_round += 1
                    hits.append(
                        (-tot, u, d.strftime("%Y-%m-%d"), min(ca, cb),
                         max(ca, cb))
                    )
    hits.sort()
    got = _Q["split_transaction_reconstruction"](spark, sf_dir).collect()
    assert len(got) == min(10, n_round)
    for g, (nt, u, day, ca, cb) in zip(got, hits[:10]):
        assert (
            g["user_id"], g["day"], g["cents_a"], g["cents_b"],
            g["total_cents"],
        ) == (u, day, ca, cb, -nt)
        assert g["n_pairs"] == n_pairs
        assert g["n_round"] == n_round
        # legs are non-round by construction
        assert g["cents_a"] % 1000 != 0 and g["cents_b"] % 1000 != 0
        assert g["total_cents"] % 1000 == 0
