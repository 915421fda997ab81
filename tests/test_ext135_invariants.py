"""ext135: literal float re-derivations of the Ljung-Box Q,
Lo-MacKinlay variance ratio, and KPSS statistics from the collected
daily series -- the textbook formulas, independently coded, so a
shared-formulation bug between the Spark and DuckDB expressions
cannot hide behind the hash oracle (CLAUDE.md recurring lesson)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext135 import (
    q_kpss_stationarity,
    q_ljung_box_q,
    q_variance_ratio_test,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def series(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per_day = {r[0]: round(r[1] * 100) for r in rows}
    return [per_day[d] for d in sorted(per_day)]


def _acf(x, k):
    n = len(x)
    mu = sum(x) / n
    num = sum((x[t] - mu) * (x[t - k] - mu) for t in range(k, n))
    den = sum((v - mu) ** 2 for v in x)
    return num / den


def test_ljung_box_matches_textbook(spark, sf_dir, series):
    got = {r["lag_k"]: r for r in q_ljung_box_q(spark, sf_dir).collect()}
    n = len(series)
    assert sorted(got) == list(range(1, 8))
    q = 0.0
    for k in range(1, 8):
        rho = _acf(series, k)
        q += rho * rho / (n - k)
        assert got[k]["rho"] == pytest.approx(rho, abs=2e-6)
        assert got[k]["q_stat"] == pytest.approx(n * (n + 2) * q, rel=1e-5)


def test_variance_ratio_matches_textbook(spark, sf_dir, series):
    got = {r["q"]: r for r in q_variance_ratio_test(spark, sf_dir).collect()}
    n = len(series)

    def svar(vals):
        m = len(vals)
        mu = sum(vals) / m
        return sum((v - mu) ** 2 for v in vals) / (m - 1)

    for q in (2, 5):
        ysum = [sum(series[t : t + q]) for t in range(n - q + 1)]
        vr = svar(ysum) / (q * svar(series))
        se = math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * n))
        assert got[q]["n_days"] == n
        assert got[q]["vr"] == pytest.approx(vr, rel=1e-5)
        assert got[q]["z_stat"] == pytest.approx((vr - 1) / se, rel=1e-4, abs=1e-5)


def test_variance_ratio_is_one_on_iid_permutation_scale():
    # sanity on the formula itself: for a constant series the q-sum
    # variance is 0 -> VR = 0; for a perfectly persistent ramp the
    # q-sums have ~q^2x the variance -> VR ~ q (textbook limits).
    n, q = 400, 5
    ramp = list(range(n))
    ysum = [sum(ramp[t : t + q]) for t in range(n - q + 1)]

    def svar(vals):
        m = len(vals)
        mu = sum(vals) / m
        return sum((v - mu) ** 2 for v in vals) / (m - 1)

    vr = svar(ysum) / (q * svar(ramp))
    assert vr == pytest.approx(q, rel=0.05)


def test_kpss_matches_textbook(spark, sf_dir, series):
    row = q_kpss_stationarity(spark, sf_dir).collect()[0]
    x = series
    n = len(x)
    mu = sum(x) / n
    e = [v - mu for v in x]
    partial = []
    acc = 0.0
    for v in e:
        acc += v
        partial.append(acc)
    l = int(math.floor(4.0 * (n / 100.0) ** 0.25))
    gamma = [
        sum(e[t] * e[t - j] for t in range(j, n)) / n for j in range(l + 1)
    ]
    lrv = gamma[0] + 2.0 * sum(
        (1.0 - j / (l + 1)) * gamma[j] for j in range(1, l + 1)
    )
    eta = sum(s * s for s in partial) / (n * n * lrv)
    assert row["n_days"] == n
    assert row["bandwidth_l"] == l
    assert row["kpss_eta"] == pytest.approx(eta, rel=1e-5)
    assert row["reject_5pct"] == (eta > 0.463)
