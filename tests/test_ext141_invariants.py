"""ext141: literal re-derivations -- moments/skew/kurtosis from raw
loops, the D'Agostino z via math.asinh, Cornish-Fisher from the
textbook expansion, Lilliefors' D via math.erf (vs the A&S polynomial
the engines share, |err| < 1.5e-7)."""

from __future__ import annotations

import math
from statistics import NormalDist

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext141 import (
    q_cornish_fisher_var,
    q_dagostino_k2,
    q_lilliefors_normality,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def dollars(spark, sf_dir):
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    return sorted(round(r[1] * 100) // 100 for r in daily)


def _moments(xs):
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((v - mu) ** 2 for v in xs) / n
    m3 = sum((v - mu) ** 3 for v in xs) / n
    m4 = sum((v - mu) ** 4 for v in xs) / n
    return n, mu, m2, m3, m4


def test_dagostino_matches_textbook(spark, sf_dir, dollars):
    row = q_dagostino_k2(spark, sf_dir).collect()[0]
    n, mu, m2, m3, m4 = _moments(dollars)
    g1 = m3 / m2**1.5
    ek = m4 / m2**2 - 3
    beta2 = (
        3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = -1 + math.sqrt(2 * (beta2 - 1))
    delta = 1 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2 / (w2 - 1))
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    z1 = delta * math.asinh(y / alpha)
    assert row["n"] == n
    assert row["skew_g1"] == pytest.approx(g1, abs=1e-5)
    assert row["excess_kurtosis"] == pytest.approx(ek, abs=1e-5)
    assert row["z_skew"] == pytest.approx(z1, abs=1e-4)


def test_dagostino_z_is_calibrated_on_normal_quantile_data():
    # formula sanity: a perfectly symmetric sample must give z ~ 0
    nd = NormalDist()
    xs = [nd.inv_cdf((i + 0.5) / 200) for i in range(200)]
    n, mu, m2, m3, m4 = _moments(xs)
    g1 = m3 / m2**1.5
    assert abs(g1) < 1e-12


def test_cornish_fisher_matches_textbook(spark, sf_dir, dollars):
    row = q_cornish_fisher_var(spark, sf_dir).collect()[0]
    n, mu, m2, m3, m4 = _moments(dollars)
    g1 = m3 / m2**1.5
    ek = m4 / m2**2 - 3
    z = NormalDist().inv_cdf(0.05)
    zcf = (
        z
        + (z * z - 1) * g1 / 6
        + (z**3 - 3 * z) * ek / 24
        - (2 * z**3 - 5 * z) * g1 * g1 / 36
    )
    sd = math.sqrt(m2)
    assert row["n"] == n
    assert row["var05_gaussian_dollars"] == pytest.approx(mu + z * sd, abs=0.02)
    assert row["var05_cornish_fisher_dollars"] == pytest.approx(
        mu + zcf * sd, abs=0.02
    )
    # exact empirical 5th percentile: min v with cum >= n/20
    k = math.ceil(n / 20)
    assert row["p05_empirical_dollars"] == dollars[k - 1]


def test_lilliefors_matches_math_erf(spark, sf_dir, dollars):
    row = q_lilliefors_normality(spark, sf_dir).collect()[0]
    xs = dollars
    n = len(xs)
    mu = sum(xs) / n
    s = math.sqrt(sum((v - mu) ** 2 for v in xs) / (n - 1))
    d = 0.0
    # sup over the sorted sample of max(F+ - Phi, Phi - F-)
    from collections import Counter

    cnt = Counter(xs)
    cum = 0
    for v in sorted(cnt):
        lo = cum / n
        cum += cnt[v]
        hi = cum / n
        phi = 0.5 * (1 + math.erf((v - mu) / s / math.sqrt(2)))
        d = max(d, hi - phi, phi - lo)
    assert row["n_days"] == n
    # A&S 7.1.26 polynomial is within 1.5e-7 of math.erf
    assert row["d_stat"] == pytest.approx(d, abs=1e-6)
    assert row["crit_5pct_approx"] == pytest.approx(0.886 / math.sqrt(n), abs=1e-6)
    assert row["reject_5pct"] == (d > 0.886 / math.sqrt(n))
