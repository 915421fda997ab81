"""Re-derivations for ext217: Luhn against a hand-checked vector + pure-python mirror, Hill
ordering laws, DL meta-analysis moments in numpy, and the Cobham
priority-wait identities."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_Q = {q.name: q.fn for q in registry()}


def test_luhn_known_vectors_and_python_mirror(spark, sf_dir):
    def luhn_ok(digits):
        s = 0
        for i, d in enumerate(digits, start=1):  # i=1 is leftmost of 16
            if i % 2 == 1:
                d2 = 2 * d
                s += d2 - 9 if d2 > 9 else d2
            else:
                s += d
        return s % 10 == 0

    # classic known-valid PAN (test number) and a corrupted twin
    valid = [int(c) for c in "4532015112830366"]
    assert luhn_ok(valid)
    assert not luhn_ok(valid[:-1] + [(valid[-1] + 1) % 10])

    import hashlib

    custs = [
        r["c_custkey"]
        for r in read_table(spark, sf_dir, "customer").collect()
    ]
    by_lead = {}
    for ck in custs:
        hx = hashlib.md5(str(ck).encode()).hexdigest()
        digits = [int(c, 16) % 10 for c in hx[:16]]
        lead = digits[0]
        tot, ok = by_lead.get(lead, (0, 0))
        by_lead[lead] = (tot + 1, ok + int(luhn_ok(digits)))
    got = {
        r["lead_digit"]: (r["n_cards"], r["n_luhn_valid"])
        for r in _Q["luhn_card_validation"](spark, sf_dir).collect()
    }
    assert got == by_lead
    total_valid = sum(v for _, v in by_lead.values())
    assert 0 < total_valid < len(custs)  # ~10%, not degenerate


def test_hill_numbers_ordering_law(spark, sf_dir):
    """Hill numbers are non-increasing in q: q0 >= q1 >= q2 for every
    nation (Jensen), with equality iff perfectly even shares."""
    for r in _Q["hill_numbers_diversity"](spark, sf_dir).collect():
        assert r["hill_q0_richness"] >= r["hill_q1"] - 1e-6
        assert r["hill_q1"] >= r["hill_q2"] - 1e-6
        assert r["hill_q2"] >= 1.0 - 1e-9


def test_meta_analysis_matches_numpy(spark, sf_dir):
    import numpy as np

    eff = (
        read_table(spark, sf_dir, "orders")
        .join(
            read_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("s"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 0).otherwise(1))
            .cast("bigint")
            .alias("f"),
        )
        .collect()
    )
    s = np.array([r["s"] for r in eff], dtype=float)
    f = np.array([r["f"] for r in eff], dtype=float)
    y = np.log(s / f)
    v = 1 / s + 1 / f
    w = 1 / v
    k = len(y)
    ybar = (w * y).sum() / w.sum()
    q = (w * (y - ybar) ** 2).sum()
    tau2 = max(0.0, (q - (k - 1)) / (w.sum() - (w**2).sum() / w.sum()))
    wr = 1 / (v + tau2)
    re = (wr * y).sum() / wr.sum()
    row = _Q["meta_analysis_dl"](spark, sf_dir).first()
    assert row["k_studies"] == k
    assert row["fixed_effect_logodds"] == pytest.approx(ybar, abs=1e-4)
    assert row["q_stat"] == pytest.approx(q, abs=1e-3)
    assert row["tau2_dl"] == pytest.approx(tau2, abs=1e-4)
    assert row["random_effect_logodds"] == pytest.approx(re, abs=1e-4)
    i2 = max(0.0, (q - (k - 1)) / q) if q > 0 else None
    if i2 is not None:
        assert row["i2"] == pytest.approx(i2, abs=1e-4)


def test_priority_wait_identities(spark, sf_dir):
    row = _Q["mm1_priority_waits"](spark, sf_dir).first()
    rho = 0.85
    # the low class always waits 1/(1-rho) times the high class
    assert row["low_to_high_ratio"] == pytest.approx(1 / (1 - rho), abs=1e-6)
    assert row["wq_low_days"] == pytest.approx(
        row["wq_high_days"] / (1 - rho), rel=1e-4
    )
    lam = (row["lam1_e6"] + row["lam2_e6"]) / 1e6
    assert row["mu_per_day"] == pytest.approx(lam / rho, rel=1e-6)
    # conservation: class-weighted wait equals the FIFO M/M/1 wait
    lam1, lam2 = row["lam1_e6"] / 1e6, row["lam2_e6"] / 1e6
    w_fifo = rho / row["mu_per_day"] / (1 - rho)
    w_mix = (lam1 * row["wq_high_days"] + lam2 * row["wq_low_days"]) / lam
    assert w_mix == pytest.approx(w_fifo, rel=1e-3)
