"""ext196: a python staggered-DID replay, the no-forbidden-comparison
law on a planted-effect panel, a bunching replay, and the planted-notch
detection law."""

from __future__ import annotations

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext196 import (
    _ADOPT_LAG,
    _BIN,
    _EVENT_TIMES,
    _NOTCH,
    q_bunching_round_notches,
    q_staggered_did_att,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _att_cells(panel):
    """panel: dict (grp, t) -> list of nation-month cents."""
    months = sorted({t for (_, t) in panel})
    mmax = months[-1]
    out = {}
    for g, lag in _ADOPT_LAG.items():
        gt = mmax - lag
        for e in _EVENT_TIMES:
            keys = [(g, gt + e), (g, gt - 1), (0, gt + e), (0, gt - 1)]
            if any(k not in panel for k in keys):
                continue
            m = [sum(panel[k]) / len(panel[k]) for k in keys]
            out[(g, e)] = (m[0] - m[1]) - (m[2] - m[3])
    return out, mmax


def test_staggered_att_matches_python(spark, sf_dir):
    from pyspark.sql import functions as F

    rows = q_staggered_did_att(spark, sf_dir).collect()
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey", "c_nationkey"
    )
    cells = (
        orders.join(cust, orders["o_custkey"] == F.col("c_custkey"))
        .selectExpr(
            "c_nationkey AS nk",
            "c_nationkey % 4 AS grp",
            "CAST(date_trunc('month', o_orderdate) AS DATE) AS mo",
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents",
        )
        .groupBy("nk", "grp", "mo")
        .agg({"cents": "sum"})
        .collect()
    )
    months = sorted({r.mo for r in cells})
    t_of = {m: i + 1 for i, m in enumerate(months)}
    panel: dict = {}
    for r in cells:
        panel.setdefault((r.grp, t_of[r.mo]), []).append(
            int(r["sum(cents)"])
        )
    ref, mmax = _att_cells(panel)
    got = {(r.cohort, r.event_time): r for r in rows}
    assert set(got) == set(ref)
    for k, att in ref.items():
        assert got[k].att_dollars == round(att / 100.0, 2) + 0.0
        assert got[k].adopt_month_idx == mmax - _ADOPT_LAG[k[0]]


def test_staggered_estimator_recovers_planted_effect():
    """A planted panel: flat outcomes everywhere except cohort 1 jumps
    by +500 from its adoption month on. The estimator must read
    ATT(1, e) = 500 exactly and ATT(2, e) = ATT(3, e) = 0 -- i.e. the
    never-treated baseline keeps already-treated cohorts out of each
    other's comparisons."""
    panel = {}
    mmax = 12
    for g in range(4):
        for t in range(1, mmax + 1):
            base = 1000 + 10 * t  # common trend
            lift = 500 if (g == 1 and t >= mmax - _ADOPT_LAG[1]) else 0
            panel[(g, t)] = [base + lift] * 5
    ref, _ = _att_cells(panel)
    assert ref[(1, 0)] == 500 and ref[(1, 1)] == 500
    assert ref[(2, 0)] == 0 and ref[(3, 0)] == 0


def test_bunching_matches_python(spark, sf_dir):
    rows = q_bunching_round_notches(spark, sf_dir).collect()
    amounts = (
        read_table(spark, sf_dir, "orders")
        .selectExpr("CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c")
        .collect()
    )
    bins: dict = {}
    for r in amounts:
        b = (r.c // _BIN) * _BIN
        bins[b] = bins.get(b, 0) + 1
    expect = []
    for b in sorted(bins):
        if b > 0 and b % _NOTCH == 0 and b - _BIN in bins and b + _BIN in bins:
            cf = (bins[b - _BIN] + bins[b + _BIN]) / 2.0
            expect.append(
                (b // 100, bins[b], round(cf, 1),
                 round((bins[b] - cf) / cf, 6) + 0.0)
            )
    expect = expect[:20]
    got = [
        (r.notch_dollars, r.observed, r.counterfactual, r.excess_mass)
        for r in rows
    ]
    assert got == expect


def test_bunching_planted_notch_law():
    """Plant a spike exactly on a notch bin of a smooth triangular
    histogram: excess mass at that notch must dominate every other."""
    bins = {b: 1000 - abs(b - 500_000) // 1000 for b in
            range(400_000, 600_001, _BIN)}
    bins[450_000] += 300  # planted spike on the $4500 notch
    excess = {}
    for b in bins:
        if b % _NOTCH == 0 and b - _BIN in bins and b + _BIN in bins:
            cf = (bins[b - _BIN] + bins[b + _BIN]) / 2.0
            excess[b] = (bins[b] - cf) / cf
    assert max(excess, key=excess.get) == 450_000
    assert excess[450_000] > 0.3
