"""ext117: literal re-derivations of MCC, Adjusted Rand, and
Fowlkes-Mallows from collected labels -- definition-level guard."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext117 import (
    _THRESH,
    q_adjusted_rand_index,
    q_fowlkes_mallows,
    q_matthews_corr,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_mcc_matches_literal(spark, sf_dir):
    got = q_matthews_corr(spark, sf_dir).collect()[0]
    orders = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in read_table(spark, sf_dir, "orders").collect()
    }
    returned = {
        r["l_orderkey"]
        for r in read_table(spark, sf_dir, "lineitem")
        .where("l_returnflag = 'R'")
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    tp = fp = fn = tn = 0
    for k, price in orders.items():
        pred, y = price > _THRESH, k in returned
        tp += pred and y
        fp += pred and not y
        fn += (not pred) and y
        tn += (not pred) and (not y)
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert got["mcc"] == pytest.approx(mcc, abs=1e-6)
    assert -1.0 <= got["mcc"] <= 1.0
    assert got["accuracy"] == pytest.approx((tp + tn) / len(orders), abs=1e-6)
    ba = 0.5 * (tp / (tp + fn) + tn / (tn + fp))
    assert got["balanced_accuracy"] == pytest.approx(ba, abs=1e-6)


def _pair_sums(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .collect()
    )
    cells = Counter((r["c_nationkey"], r["c_mktsegment"]) for r in rows)
    a = Counter(r["c_nationkey"] for r in rows)
    b = Counter(r["c_mktsegment"] for r in rows)
    c2 = lambda x: x * (x - 1) // 2
    return (
        len(rows),
        sum(c2(v) for v in cells.values()),
        sum(c2(v) for v in a.values()),
        sum(c2(v) for v in b.values()),
    )


def test_ari_matches_literal(spark, sf_dir):
    got = q_adjusted_rand_index(spark, sf_dir).collect()[0]
    n, s_cells, s_rows, s_cols = _pair_sums(spark, sf_dir)
    assert (got["n"], got["pairs_both"]) == (n, s_cells)
    assert (got["pairs_nation"], got["pairs_segment"]) == (s_rows, s_cols)
    exp = s_rows * s_cols / (n * (n - 1) / 2)
    ari = (s_cells - exp) / (0.5 * (s_rows + s_cols) - exp)
    assert got["ari"] == pytest.approx(ari, abs=1e-6)
    # independent-by-construction partitions -> chance-corrected ~ 0
    assert abs(got["ari"]) < 0.15


def test_fowlkes_mallows_matches_literal(spark, sf_dir):
    got = q_fowlkes_mallows(spark, sf_dir).collect()[0]
    n, s_cells, s_rows, s_cols = _pair_sums(spark, sf_dir)
    fm = s_cells / math.sqrt(s_rows * s_cols)
    assert got["fm_index"] == pytest.approx(fm, abs=1e-6)
    p, r = s_cells / s_rows, s_cells / s_cols
    assert got["precision_pairs"] == pytest.approx(p, abs=1e-6)
    assert got["recall_pairs"] == pytest.approx(r, abs=1e-6)
    # FM is the geometric mean of pair precision/recall
    assert got["fm_index"] == pytest.approx(math.sqrt(p * r), abs=1e-6)
