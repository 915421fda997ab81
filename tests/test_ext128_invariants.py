"""ext128: literal re-derivations -- QTE via sorted-list order
statistics, supply concentration via dict HHI."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext128 import (
    _QS,
    q_qte_events_variant,
    q_supply_concentration_parts,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_qte_matches_sorted_order_stats(spark, sf_dir):
    got = {r["q"]: r for r in q_qte_events_variant(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    ).collect()
    arms = {0: [], 1: []}
    for r in ev:
        if r["event_type"] == "purchase":
            arms[r["user_id"] % 2].append(round(r["value"] * 100))
    for a in arms.values():
        a.sort()
    assert set(got) == set(_QS)
    for q in _QS:
        r = got[q]
        assert r["n_treat"] == len(arms[1])
        assert r["n_control"] == len(arms[0])

        def ostat(xs):
            # smallest v with 100*rank >= q*n (type-1)
            k = math.ceil(q * len(xs) / 100)
            return xs[k - 1]

        assert r["q_treat_dollars"] == pytest.approx(ostat(arms[1]) / 100, abs=0.01)
        assert r["q_control_dollars"] == pytest.approx(
            ostat(arms[0]) / 100, abs=0.01
        )
        assert r["qte_dollars"] == pytest.approx(
            (ostat(arms[1]) - ostat(arms[0])) / 100, abs=0.01
        )
    # quantile cuts are monotone in q within each arm
    assert got[25]["q_treat_dollars"] <= got[50]["q_treat_dollars"] <= got[75]["q_treat_dollars"]


def test_supply_concentration_matches_dict(spark, sf_dir):
    got = q_supply_concentration_parts(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    ).collect()
    qty = defaultdict(lambda: defaultdict(int))
    for r in li:
        qty[r["l_partkey"]][r["l_suppkey"]] += int(r["l_quantity"])
    n_parts = len(qty)
    n_single = sum(1 for s in qty.values() if len(s) == 1)
    hhis = []
    for s in qty.values():
        tot = sum(s.values())
        hhis.append(sum((v / tot) ** 2 for v in s.values()))
    assert got["n_parts"] == n_parts
    assert got["n_single_source"] == n_single
    assert got["single_source_ppm"] == (1000000 * n_single) // n_parts
    assert got["mean_hhi"] == pytest.approx(
        sum(hhis) / n_parts, abs=2e-6
    )
    # HHI of a share vector always lies in [1/n_supp_max, 1]
    assert 0.0 < got["mean_hhi"] <= 1.0
