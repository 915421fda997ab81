"""Drift guard: the BATCH rule path (plans.scoring.score_transactions,
pure column expressions) and the STREAMING rule path
(streaming.stateful.fold_events, python fold) must produce identical
verdicts for every combination of rule inputs."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Row

from fraud_detection_in_banking_transactions_using_hadoop_spark.plans.scoring import score_transactions
from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.stateful import fold_events

NYC = (40.7128, -74.0060)
LA = (34.0522, -118.2437)
GEO_ROWS = [("100", *NYC), ("200", *LA)]

# grid over every rule dimension
AMOUNTS = [50.0, 150.0]          # vs ucl 100
SCORES = [150, 500]              # vs threshold 200
POSTCODES = [100, 200, 999]      # same place / teleport / unknown zip
TS = [
    "2024-01-01 10:00:00",       # dt = 0
    "2024-01-01 10:01:40",       # dt = 100 s (teleport if zip changes)
    "2024-01-11 10:00:00",       # dt = 10 days (slow)
    "2023-12-31 10:00:00",       # dt < 0 (out of order)
]
LAST_STATE = (100, "2024-01-01 10:00:00")


@pytest.fixture(scope="module")
def grids(spark):
    zip_geo = spark.createDataFrame(
        [Row(zip=z, lat=la, lon=lo, city="?", state="?", pos_id="0") for z, la, lo in GEO_ROWS]
    )
    cases = []
    for i, (amount, score, pc, ts) in enumerate(
        itertools.product(AMOUNTS, SCORES, POSTCODES, TS)
    ):
        cases.append(
            dict(card_id=i, member_id=i, amount=amount, pos_id=1, postcode=pc,
                 transaction_dt=ts, score=score)
        )
    lookup_rows = [
        Row(card_id=c["card_id"], ucl=100.0, postcode=LAST_STATE[0],
            transaction_dt=LAST_STATE[1], score=c["score"])
        for c in cases
    ]
    return cases, spark.createDataFrame(lookup_rows), zip_geo


def test_batch_and_fold_agree_on_every_rule_combination(spark, grids):
    cases, lookup_df, zip_geo = grids

    payloads = spark.createDataFrame(
        [Row(**{k: v for k, v in c.items() if k != "score"}) for c in cases]
    )
    batch = {
        r.card_id: r.status
        for r in score_transactions(payloads, lookup_df, zip_geo).collect()
    }

    geo = {z: (la, lo) for z, la, lo in GEO_ROWS}
    for c in cases:
        lookup = {c["card_id"]: (100.0, c["score"])}
        statuses, _ = fold_events(
            [{k: v for k, v in c.items() if k != "score"}], LAST_STATE, lookup, geo
        )
        assert statuses[0] == batch[c["card_id"]], (
            f"rule drift for {c}: fold={statuses[0]} batch={batch[c['card_id']]}"
        )
