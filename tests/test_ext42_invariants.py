"""Definition-level checks for the ext42 batch."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext42 import (
    q_dhondt_allocation,
    q_luhn_check_summary,
    q_randomized_response_debias,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _luhn_total(digits15, check):
    s = 0
    for i, d in enumerate(digits15, start=1):
        if i % 2 == 1:
            dd = 2 * d
            s += dd - 9 if dd > 9 else dd
        else:
            s += d
    return s + check


def test_luhn_detects_every_single_digit_corruption(spark, sf_dir):
    got = q_luhn_check_summary(spark, sf_dir).toPandas().iloc[0]
    cust = read_table(spark, sf_dir, "customer").select("c_custkey").toPandas()
    n_valid = n_invalid = n_corr = 0
    for ck in cust.c_custkey:
        hx = hashlib.md5(str(ck).encode()).hexdigest()
        d = [int(hx[i], 16) % 10 for i in range(15)]
        check = (10 - _luhn_total(d, 0) % 10) % 10
        assert _luhn_total(d, check) % 10 == 0  # synthesized PANs validate
        corrupted = ck % 7 == 0
        dd = list(d)
        if corrupted:
            n_corr += 1
            dd[4] = (dd[4] + 1) % 10
        if _luhn_total(dd, check) % 10 == 0:
            n_valid += 1
        else:
            n_invalid += 1
    assert int(got.n_cards) == len(cust)
    assert int(got.n_corrupted) == n_corr
    assert (int(got.n_valid), int(got.n_invalid)) == (n_valid, n_invalid)
    # Luhn catches every single-digit error
    assert int(got.n_invalid) == int(got.n_corrupted)
    assert int(got.n_valid) == int(got.n_cards) - int(got.n_corrupted)


def test_dhondt_matches_literal_highest_quotients(spark, sf_dir):
    got = q_dhondt_allocation(spark, sf_dir).toPandas().set_index("party")
    cust = read_table(spark, sf_dir, "customer").select("c_nationkey").toPandas()
    votes = cust.groupby("c_nationkey").size()
    grid = [
        ((1000000 * int(v)) // k, p, k)
        for p, v in votes.items()
        for k in range(1, 51)
    ]
    top = sorted(grid, key=lambda t: (-t[0], t[1], t[2]))[:50]
    seats: dict = {}
    for _, p, _ in top:
        seats[p] = seats.get(p, 0) + 1
    assert int(got.seats.sum()) == 50
    for p, v in votes.items():
        assert int(got.loc[p].votes) == int(v)
        assert int(got.loc[p].seats) == seats.get(p, 0)


def test_randomized_response_inverts_the_mechanism(spark, sf_dir):
    got = q_randomized_response_debias(spark, sf_dir).toPandas().iloc[0]
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal").toPandas()
    k_true = k_rep = 0
    for r in cust.itertuples():
        truth = int(r.c_acctbal > 5000)
        c1 = int(hashlib.md5(f"{r.c_custkey}coin1".encode()).hexdigest()[:8], 16) % 4
        c2 = int(hashlib.md5(f"{r.c_custkey}coin2".encode()).hexdigest()[:8], 16) % 2
        rep = truth if c1 < 3 else c2
        k_true += truth
        k_rep += rep
    n = len(cust)
    assert (int(got.n), int(got.k_true), int(got.k_reported)) == (n, k_true, k_rep)
    assert int(got.debiased_ppm) == (1000000 * (8 * k_rep - n)) // (6 * n)
    # unbiasedness shows up as a finite-sample bound: |p_hat - p| is
    # within ~4 standard errors of the mechanism (se = (4/3)*sqrt(
    # 1/(4n))). (A strict "closer than the raw share" claim can fail
    # by luck at small n -- the raw share is sometimes dead-on.)
    import math

    true_ppm = (1000000 * k_true) // n
    bound = int(4 * (4 / 3) * math.sqrt(0.25 / n) * 1000000)
    assert abs(int(got.debiased_ppm) - true_ppm) <= bound
