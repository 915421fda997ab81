"""Unit tests for the batch scorer (SURVEY.md 3.2): the three rules and
every 1.4(7) edge case -- new card, dt <= 0, missing zip."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from fraud_detection_in_banking_transactions_using_hadoop_spark.plans.scoring import score_transactions


@pytest.fixture(scope="module")
def zip_geo(spark):
    rows = [
        Row(zip="100", lat=40.7128, lon=-74.0060, city="NYC", state="NY", pos_id="1"),
        Row(zip="200", lat=34.0522, lon=-118.2437, city="LA", state="CA", pos_id="2"),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def lookup(spark):
    rows = [
        # card 1: healthy score, ucl 100, last seen NYC at 10:00
        Row(card_id=1, ucl=100.0, postcode=100, transaction_dt="2024-01-01 10:00:00", score=500),
        # card 2: bad score
        Row(card_id=2, ucl=100.0, postcode=100, transaction_dt="2024-01-01 10:00:00", score=150),
        # card 4: lookup row with an unknown zip
        Row(card_id=4, ucl=100.0, postcode=999, transaction_dt="2024-01-01 10:00:00", score=500),
    ]
    return spark.createDataFrame(rows)


def _payload(card_id, amount, postcode, ts):
    return Row(card_id=card_id, member_id=card_id, amount=float(amount),
               pos_id=1, postcode=postcode, transaction_dt=ts)


def _score(spark, lookup, zip_geo, payloads):
    df = spark.createDataFrame(payloads)
    out = score_transactions(df, lookup, zip_geo)
    return {r.card_id: r for r in out.collect()}


def test_genuine_when_all_rules_pass(spark, lookup, zip_geo):
    # same city 2h later, small amount, good score
    got = _score(spark, lookup, zip_geo, [_payload(1, 50, 100, "2024-01-01 12:00:00")])
    assert got[1].status == "GENUINE"
    assert got[1].dist_km == 0.0


def test_score_rule_fires(spark, lookup, zip_geo):
    got = _score(spark, lookup, zip_geo, [_payload(2, 50, 100, "2024-01-01 12:00:00")])
    assert got[2].status == "FRAUD"


def test_amount_rule_fires(spark, lookup, zip_geo):
    got = _score(spark, lookup, zip_geo, [_payload(1, 101, 100, "2024-01-01 12:00:00")])
    assert got[1].status == "FRAUD"


def test_speed_rule_fires(spark, lookup, zip_geo):
    # NYC -> LA (~3936 km) in 100 seconds = ~39 km/s > 0.25
    got = _score(spark, lookup, zip_geo, [_payload(1, 50, 200, "2024-01-01 10:01:40")])
    assert got[1].status == "FRAUD"
    assert got[1].speed_kms > 0.25


def test_slow_travel_is_genuine(spark, lookup, zip_geo):
    # NYC -> LA in 10 days: ~0.0046 km/s
    got = _score(spark, lookup, zip_geo, [_payload(1, 50, 200, "2024-01-11 10:00:00")])
    assert got[1].status == "GENUINE"


def test_zero_dt_fires_speed_rule(spark, lookup, zip_geo):
    # same timestamp as lookup state: dt = 0 -> reference divides by zero
    # -> Inf -> FRAUD (SURVEY.md 1.4(7)); we fire the rule without dividing.
    got = _score(spark, lookup, zip_geo, [_payload(1, 50, 200, "2024-01-01 10:00:00")])
    assert got[1].status == "FRAUD"
    assert got[1].speed_kms is None


def test_new_card_missing_lookup_is_genuine(spark, lookup, zip_geo):
    # card 3 has no lookup row: every rule input NULL -> no rule can prove
    # fraud -> GENUINE (engine decision for the reference's NPE, 1.4(7)).
    got = _score(spark, lookup, zip_geo, [_payload(3, 1e9, 100, "2024-01-01 12:00:00")])
    assert got[3].status == "GENUINE"


def test_missing_zip_passes_speed_rule(spark, lookup, zip_geo):
    # card 4's last postcode 999 resolves to no geo row -> distance NULL ->
    # speed rule passes (reference would throw, FraudDistMetric.java:62-64).
    got = _score(spark, lookup, zip_geo, [_payload(4, 50, 100, "2024-01-01 12:00:00")])
    assert got[4].status == "GENUINE"
    assert got[4].dist_km is None
