"""ext134: literal re-derivations of the Nigrini forensic trio from
collected orders."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext134 import (
    q_benford_summation_test,
    q_duplicate_amount_audit,
    q_relative_size_factor,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _orders(spark, sf_dir):
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    ).collect()


def test_benford_summation_matches_literal(spark, sf_dir):
    got = q_benford_summation_test(spark, sf_dir).collect()
    sums = defaultdict(int)
    counts = Counter()
    for r in _orders(spark, sf_dir):
        if r["o_totalprice"] < 10:
            continue
        cents = round(r["o_totalprice"] * 100)
        d2 = int(str(cents)[:2])
        if 10 <= d2 <= 99:
            sums[d2] += cents
            counts[d2] += 1
    ss = sum(sums.values())
    order = sorted(sums, key=lambda d: (-sums[d] / ss, d))[:10]
    assert [r["first_two_digits"] for r in got] == order
    for r in got:
        d = r["first_two_digits"]
        assert r["n"] == counts[d]
        assert r["sum_dollars"] == pytest.approx(sums[d] / 100, abs=0.01)
        assert r["sum_share"] == pytest.approx(sums[d] / ss, abs=1e-6)
        assert r["excess_vs_uniform"] == pytest.approx(
            sums[d] / ss - 1 / 90, abs=1e-6
        )


def test_rsf_matches_literal(spark, sf_dir):
    got = [
        (r["card_id"], r["largest_dollars"], r["second_dollars"], r["rsf"])
        for r in q_relative_size_factor(spark, sf_dir).collect()
    ]
    per = defaultdict(list)
    for r in _orders(spark, sf_dir):
        per[r["o_custkey"]].append(round(r["o_totalprice"] * 100))
    scored = []
    for cust, vals in per.items():
        if len(vals) < 2:
            continue
        vals.sort(reverse=True)
        rsf_e6 = (1000000 * vals[0]) // vals[1]
        scored.append((cust, vals[0], vals[1], rsf_e6))
    scored.sort(key=lambda t: (-t[3], t[0]))
    want = [
        (c, pytest.approx(mx / 100, abs=0.01), pytest.approx(sec / 100, abs=0.01),
         pytest.approx(r / 1e6, abs=1e-6))
        for c, mx, sec, r in scored[:20]
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == w[1] and g[2] == w[2] and g[3] == w[3]
    # RSF is a ratio of sorted maxima: always >= 1
    assert all(g[3] >= 1.0 for g in got)


def test_duplicate_payments_match_literal(spark, sf_dir):
    got = q_duplicate_amount_audit(spark, sf_dir).collect()[0]
    groups = defaultdict(lambda: [0, set()])
    n_tot = 0
    for r in _orders(spark, sf_dir):
        n_tot += 1
        cell = groups[(r["o_custkey"], round(r["o_totalprice"] * 100))]
        cell[0] += 1
        d = r["o_orderdate"]
        cell[1].add(d.date() if hasattr(d, "date") else d)
    dups = {k: v for k, v in groups.items() if v[0] >= 2}
    assert got["n_orders_total"] == n_tot
    assert got["n_dup_groups"] == len(dups)
    assert got["n_dup_orders"] == sum(v[0] for v in dups.values())
    assert got["n_cross_day_groups"] == sum(
        1 for v in dups.values() if len(v[1]) > 1
    )
