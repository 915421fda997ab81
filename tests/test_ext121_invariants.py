"""ext121: literal re-derivations -- Friedman/Quade from textbook rank
formulas on dict-built blocks, tail dependence from sorted-rank PITs."""

from __future__ import annotations

from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext121 import (
    _K,
    q_friedman_test,
    q_quade_test,
    q_tail_dependence_daily,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table
from pyspark.sql import functions as F


def _blocks(spark, sf_dir):
    """(year, month) -> dow -> revenue cents, complete blocks only."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    import datetime

    anchor = datetime.date(1992, 1, 6)
    daily = defaultdict(int)
    for r in orders:
        d = r["o_orderdate"]
        if isinstance(d, datetime.datetime):
            d = d.date()
        daily[d] += round(r["o_totalprice"] * 100)
    blocks = defaultdict(lambda: defaultdict(int))
    for d, cents in daily.items():
        dow = (d - anchor).days % 7
        blocks[(d.year, d.month)][dow] += cents
    return {b: dict(v) for b, v in blocks.items() if len(v) == _K}


def _midranks(vals):
    out = {}
    for k, v in vals.items():
        out[k] = 1 + sum(
            1.0 if v2 < v else 0.5 if (k2 != k and v2 == v) else 0.0
            for k2, v2 in vals.items()
        )
    return out


def test_friedman_matches_literal(spark, sf_dir):
    got = q_friedman_test(spark, sf_dir).collect()[0]
    blocks = _blocks(spark, sf_dir)
    n = len(blocks)
    assert got["n_blocks"] == n and got["k"] == _K
    rj = defaultdict(float)
    for v in blocks.values():
        for dow, r in _midranks(v).items():
            rj[dow] += r
    q = 12.0 / (n * _K * (_K + 1)) * sum(r * r for r in rj.values()) - 3.0 * n * (
        _K + 1
    )
    assert got["friedman_q"] == pytest.approx(q, abs=2e-6)
    assert got["friedman_q"] >= 0


def test_quade_matches_literal(spark, sf_dir):
    got = q_quade_test(spark, sf_dir).collect()[0]
    blocks = _blocks(spark, sf_dir)
    n = len(blocks)
    assert got["n_blocks"] == n
    rng = {b: max(v.values()) - min(v.values()) for b, v in blocks.items()}
    qr = _midranks(rng)
    s = {}
    for b, v in blocks.items():
        for dow, r in _midranks(v).items():
            s[(b, dow)] = qr[b] * (r - (_K + 1) / 2.0)
    tj = defaultdict(float)
    for (b, dow), val in s.items():
        tj[dow] += val
    a2 = sum(val * val for val in s.values())
    bb = sum(t * t for t in tj.values()) / n
    assert got["b_stat"] == pytest.approx(bb, rel=1e-6)
    assert got["quade_f"] == pytest.approx((n - 1) * bb / (a2 - bb), rel=1e-5)


def test_tail_dependence_matches_literal(spark, sf_dir):
    got = q_tail_dependence_daily(spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders").groupBy("o_orderdate").agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("y"),
    ).collect()
    xs = [int(r["x"]) for r in orders]
    ys = [int(r["y"]) for r in orders]
    n = len(xs)
    assert got["n_days"] == n
    rx = [sum(1 for v in xs if v <= x) for x in xs]
    ry = [sum(1 for v in ys if v <= y) for y in ys]
    up = sum(
        1
        for i in range(n)
        if 10 * rx[i] > 9 * (n + 1) and 10 * ry[i] > 9 * (n + 1)
    )
    lo = sum(
        1 for i in range(n) if 10 * rx[i] <= n + 1 and 10 * ry[i] <= n + 1
    )
    assert (got["upper_both"], got["lower_both"]) == (up, lo)
    assert got["lambda_upper"] == pytest.approx(up / (0.1 * (n + 1)), abs=1e-6)
    assert got["lambda_lower"] == pytest.approx(lo / (0.1 * (n + 1)), abs=1e-6)
    # count and revenue co-move: extremes should co-occur far above
    # the independence level (lambda ~ 0.1 under independence)
    assert got["lambda_upper"] > 0.3
