"""ext148: literal re-derivations -- the EM rounds replayed in raw
Python floats (no quantization) over the collected spine, the
ln-factorial CASE cross-checked against math.lgamma, and Fisher's p
against an exact-Fraction hypergeometric."""

from __future__ import annotations

import math
from collections import Counter
from fractions import Fraction

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext148 import (
    _EM_ROUNDS,
    _TOP_N,
    _lnfact_sql,
    q_fisher_exact_2x2,
    q_gmm_em_2comp,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_lnfact_case_matches_lgamma(spark):
    # evaluate the shared SQL text on a literal grid in Spark itself
    grid = spark.range(0, 200).selectExpr(
        "id", f"{_lnfact_sql('id')} AS lf"
    ).collect()
    for r in grid:
        assert r["lf"] == pytest.approx(
            math.lgamma(r["id"] + 1), rel=1e-10, abs=1e-10
        )


def _em(spine, rounds=_EM_ROUNDS):
    n = sum(c for _, c in spine)
    sx = sum(v * c for v, c in spine)
    sxx = sum(v * v * c for v, c in spine)
    # exact weighted Q25 / Q75 (min v with 4cc >= n / >= 3n)
    cum, q25, q75 = 0, None, None
    for v, c in sorted(spine):
        cum += c
        if q25 is None and 4 * cum >= n:
            q25 = v
        if q75 is None and 4 * cum >= 3 * n:
            q75 = v
    w1 = 0.5
    mu0, mu1 = float(q25), float(q75)
    var = max((n * sxx - sx * sx) / n / n / 4.0, 1.0)
    sg0 = sg1 = var

    def phi(v, mu, s2):
        return math.exp(-((v - mu) ** 2) / (2 * s2)) / math.sqrt(
            2 * math.pi * s2
        )

    for _ in range(rounds):
        n0 = n1 = s0 = s1 = qq0 = qq1 = 0.0
        for v, c in spine:
            p0, p1 = phi(v, mu0, sg0), phi(v, mu1, sg1)
            den = (1 - w1) * p0 + w1 * p1
            if den > 0:
                r1 = w1 * p1 / den
            else:
                r1 = (
                    1.0
                    if (v - mu0) ** 2 / sg0 > (v - mu1) ** 2 / sg1
                    else 0.0
                )
            n1 += c * r1
            s1 += c * r1 * v
            qq1 += c * r1 * v * v
            n0 += c * (1 - r1)
            s0 += c * (1 - r1) * v
            qq0 += c * (1 - r1) * v * v
        w1 = n1 / (n0 + n1)
        mu0, mu1 = s0 / n0, s1 / n1
        sg0 = max(qq0 / n0 - mu0 * mu0, 1.0)
        sg1 = max(qq1 / n1 - mu1 * mu1, 1.0)
    return w1, mu0, mu1, sg0, sg1


def test_gmm_matches_float_em(spark, sf_dir):
    row = q_gmm_em_2comp(spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    cnt = Counter(round(r["o_totalprice"] * 100) // 100 for r in orders)
    spine = sorted(cnt.items())
    w1, mu0, mu1, sg0, sg1 = _em(spine)
    # quantization at e6/e2/e0 drifts the states by ~1e-5 relative
    assert row["weight_high"] == pytest.approx(w1, abs=1e-4)
    assert row["weight_low"] == pytest.approx(1 - w1, abs=1e-4)
    assert row["mu_low_dollars"] == pytest.approx(mu0, abs=0.5)
    assert row["mu_high_dollars"] == pytest.approx(mu1, abs=0.5)
    assert row["sigma_low_dollars"] == pytest.approx(math.sqrt(sg0), abs=0.5)
    assert row["sigma_high_dollars"] == pytest.approx(math.sqrt(sg1), abs=0.5)
    # the two components must actually separate
    assert row["mu_low_dollars"] < row["mu_high_dollars"]
    assert 0 < row["weight_high"] < 1


def test_fisher_matches_exact_fractions(spark, sf_dir):
    row = q_fisher_exact_2x2(spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).collect()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    ).collect()
    spend = Counter()
    cust_of = {}
    for r in orders:
        spend[r["o_custkey"]] += round(r["o_totalprice"] * 100)
        cust_of[r["o_orderkey"]] = r["o_custkey"]
    ret_custs = {
        cust_of[r["l_orderkey"]]
        for r in li
        if r["l_returnflag"] == "R" and r["l_orderkey"] in cust_of
    }
    top = {
        c
        for c, _ in sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_TOP_N
        ]
    }
    nn = len(spend)
    c1 = sum(1 for c in spend if c in ret_custs)
    a = sum(1 for c in top if c in ret_custs)

    def comb(n, k):
        return math.comb(n, k)

    denom = comb(nn, _TOP_N)
    pk = {
        k: Fraction(comb(c1, k) * comb(nn - c1, _TOP_N - k), denom)
        for k in range(
            max(0, _TOP_N + c1 - nn), min(_TOP_N, c1) + 1
        )
    }
    p_obs = pk[a]
    p_two = float(sum(p for p in pk.values() if p <= p_obs))
    assert row["n_customers"] == nn
    assert row["n_with_return"] == c1
    assert row["top20_with_return"] == a
    assert row["p_observed_table"] == pytest.approx(float(p_obs), abs=1e-5)
    assert row["p_two_sided"] == pytest.approx(p_two, abs=1e-4)
    assert 0 <= row["p_two_sided"] <= 1 + 1e-9
