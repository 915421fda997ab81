"""ext123: literal python re-derivations of the AML pattern screens
from collected raw events."""

from __future__ import annotations

from collections import defaultdict

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext123 import (
    _BAND_HI,
    _BAND_LO,
    _BURST_US,
    _FOLLOW_US,
    q_activity_shift_ratio,
    q_ato_error_burst,
    q_structuring_detection,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table
from pyspark.sql import functions as F


def _events(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "value", F.unix_micros("ts").alias("us"))
        .collect()
    )


def test_structuring_matches_literal(spark, sf_dir):
    got = {
        (r["user_id"], r["day"]): (r["n_band"], r["band_cents"])
        for r in q_structuring_detection(spark, sf_dir).collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for r in _events(spark, sf_dir):
        if r["event_type"] == "purchase" and _BAND_LO <= r["value"] < _BAND_HI:
            day = str(
                __import__("datetime")
                .datetime.fromtimestamp(r["us"] / 1e6, tz=__import__("datetime").timezone.utc)
                .date()
            )
            cell = agg[(r["user_id"], day)]
            cell[0] += 1
            cell[1] += round(r["value"] * 100)
    want = {k: tuple(v) for k, v in agg.items() if v[0] >= 2}
    assert got == want


def test_ato_burst_matches_literal(spark, sf_dir):
    got = {
        r["user_id"]: (r["n_burst_anchors"], r["n_followed_by_purchase"])
        for r in q_ato_error_burst(spark, sf_dir).collect()
    }
    errs = defaultdict(list)
    purch = defaultdict(list)
    for r in _events(spark, sf_dir):
        if r["event_type"] == "error":
            errs[r["user_id"]].append(r["us"])
        elif r["event_type"] == "purchase":
            purch[r["user_id"]].append(r["us"])
    want = {}
    for u, ts in errs.items():
        ts.sort()
        anchors = [
            t for t in ts if sum(1 for s in ts if t - _BURST_US <= s <= t) >= 3
        ]
        if not anchors:
            continue
        followed = sum(
            1
            for t in anchors
            if any(t < p <= t + _FOLLOW_US for p in purch.get(u, []))
        )
        want[u] = (len(anchors), followed)
    assert got == want
    assert len(want) > 0  # the screen fires at sf0.001 too


def test_activity_shift_matches_literal(spark, sf_dir):
    got = [
        (r["user_id"], r["n_recent"], r["n_base"], r["shift_score_e6"])
        for r in q_activity_shift_ratio(spark, sf_dir).collect()
    ]
    ev = _events(spark, sf_dir)
    mx = max(r["us"] for r in ev)
    mn = min(r["us"] for r in ev)
    cut = mx - 7 * 86400 * 1000000
    base_days = (cut - mn) // (86400 * 1000000)
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        if r["us"] > cut:
            per[r["user_id"]][0] += 1
        else:
            per[r["user_id"]][1] += 1
    scored = sorted(
        (
            (u, nr, nb, (1000000 * nr * base_days) // (7 * (nb + 1)))
            for u, (nr, nb) in per.items()
        ),
        key=lambda t: (-t[3], t[0]),
    )[:20]
    assert got == scored
    # rate-shift scores are in review-queue order
    assert all(
        got[i][3] >= got[i + 1][3] for i in range(len(got) - 1)
    )
