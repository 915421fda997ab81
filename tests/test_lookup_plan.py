"""Golden tests for the batch lookup build (SURVEY.md 3.1) on hand-checked
micro fixtures (FIXTURES.md 1-3): the stddev_pop trap, top-10 selection,
argmax, and case-insensitive status."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from fraud_detection_in_banking_transactions_using_hadoop_spark.plans.lookup import build_lookup


def _txn(card_id, amount, ts, status="GENUINE", postcode=100, pos_id=1, member_id=1):
    return Row(
        card_id=card_id, member_id=member_id, amount=float(amount), postcode=postcode,
        pos_id=pos_id, transaction_dt=ts, status=status,
    )


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    txns = [
        # card 1: 3 genuine amounts 10, 20, 40 -> avg 23.333, stddev_pop 12.472
        _txn(1, 10, "2024-01-01 10:00:00", postcode=111),
        _txn(1, 20, "2024-01-02 10:00:00", postcode=222),
        _txn(1, 40, "2024-01-03 10:00:00", postcode=333),
        # a FRAUDULENT row that must be excluded from UCL and argmax
        _txn(1, 9999, "2024-01-04 10:00:00", status="FRAUDULENT", postcode=999),
        # card 2: 12 genuine rows amounts 1..12 -> only last 10 (3..12) count
        *[
            _txn(2, i, f"2024-01-{i:02d} 09:00:00", postcode=200 + i, member_id=2)
            for i in range(1, 13)
        ],
        # card 3: lowercase status must still count (case-insensitive read)
        _txn(3, 50, "2024-02-01 08:00:00", status="genuine", postcode=301, member_id=3),
    ]
    members = [
        Row(card_id=1, member_id=1, member_joining_dt="2020-01-01",
            card_purchase_dt="2020-01-02", country="US", city="NYC"),
        Row(card_id=2, member_id=2, member_joining_dt="2020-01-01",
            card_purchase_dt="2020-01-02", country="US", city="LA"),
        Row(card_id=3, member_id=3, member_joining_dt="2020-01-01",
            card_purchase_dt="2020-01-02", country="US", city="SF"),
    ]
    scores = [Row(member_id=1, score=500), Row(member_id=2, score=150),
              Row(member_id=3, score=700)]
    return (
        spark.createDataFrame(txns),
        spark.createDataFrame(members),
        spark.createDataFrame(scores),
    )


@pytest.fixture(scope="module")
def lookup_rows(fixture_dfs):
    txns, members, scores = fixture_dfs
    return {r.card_id: r for r in build_lookup(txns, members, scores).collect()}


def test_ucl_uses_population_stddev(lookup_rows):
    # avg(10,20,40)=23.333..; stddev_pop=12.472.. (samp would be 15.275)
    amounts = [10, 20, 40]
    mean = sum(amounts) / 3
    var_pop = sum((a - mean) ** 2 for a in amounts) / 3
    expected = mean + 3 * math.sqrt(var_pop)
    assert abs(lookup_rows[1].ucl - expected) < 1e-9
    samp = mean + 3 * math.sqrt(sum((a - mean) ** 2 for a in amounts) / 2)
    assert abs(lookup_rows[1].ucl - samp) > 1  # would fail with stddev_samp


def test_top_ten_limit(lookup_rows):
    # card 2: last 10 of 12 rows -> amounts 3..12
    amounts = list(range(3, 13))
    mean = sum(amounts) / len(amounts)
    var_pop = sum((a - mean) ** 2 for a in amounts) / len(amounts)
    expected = mean + 3 * math.sqrt(var_pop)
    assert abs(lookup_rows[2].ucl - expected) < 1e-9


def test_argmax_latest_postcode_excludes_fraud(lookup_rows):
    # card 1's latest GENUINE txn is 2024-01-03 (postcode 333); the later
    # FRAUDULENT row must not win (FDProcBatch feeds card_zipcode from the
    # genuine-only last-ten table).
    assert lookup_rows[1].postcode == 333
    assert lookup_rows[1].transaction_dt == "2024-01-03 10:00:00"


def test_case_insensitive_status_and_score_join(lookup_rows):
    assert lookup_rows[3].postcode == 301  # lowercase 'genuine' counted
    assert lookup_rows[1].score == 500
    assert lookup_rows[2].score == 150
    assert lookup_rows[3].score == 700
    # single-row group: stddev_pop = 0 -> ucl == amount
    assert abs(lookup_rows[3].ucl - 50.0) < 1e-12
