"""ext174: literal re-derivations -- BCa vs a python replay of the
hash bootstrap + Acklam/erf adjustments (plus the reduction law:
z0 = 0, a = 0 makes the BCa levels exactly 2.5/97.5 percent), PK vs
the moment loop (plus the exponential-service law: CV = 1 makes
M/G/1 equal M/M/1, and deterministic service halves the wait), and
mover-stayer vs a month-grid loop (plus the homogeneity law: a
single chain with q22 == q1^2 gives s == 0, and the identity
q22 >= q1^2 under any 2-mixture)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext174 import (
    _B,
    _Z95,
    q_bootstrap_bca_ci,
    q_mover_stayer_split,
    q_pollaczek_khinchine_wait,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)
from pyspark.sql import functions as F


def _acklam(p):
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]

    def horner(cs, x):
        r = cs[0]
        for co in cs[1:]:
            r = r * x + co
        return r

    if p < 0.02425:
        q = math.sqrt(-2 * math.log(p))
        return horner(c, q) / (horner(d, q) * q + 1)
    if p > 1 - 0.02425:
        q = math.sqrt(-2 * math.log(1 - p))
        return -horner(c, q) / (horner(d, q) * q + 1)
    q = p - 0.5
    r = q * q
    return horner(a, r) * q / (horner(b, r) * r + 1)


def _phi(x):
    return 0.5 * (1 + math.erf(x / math.sqrt(2)))


def test_bca_matches_replay(spark, sf_dir):
    row = q_bootstrap_bca_ci(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) // 100 for r in daily}
    cs = [per[d] for d in sorted(per)]
    n, s_tot = len(cs), sum(cs)
    reps = []
    for r in range(_B):
        tot = 0
        for i in range(n):
            pick = ((r * 104729 + i * 999983 + 12289) % 2147483647) % n
            tot += cs[pick]
        reps.append((tot, r))
    ranked = sorted(reps)
    p0 = min(max(sum(1 for sr, _ in reps if sr < s_tot) / _B, 0.5 / _B),
             1 - 0.5 / _B)
    z0 = _acklam(p0)
    us = [c * n - s_tot for c in cs]
    a = sum(u**3 for u in us) / (6 * sum(u * u for u in us) ** 1.5)
    a1 = _phi(z0 + (z0 - _Z95) / (1 - a * (z0 - _Z95)))
    a2 = _phi(z0 + (z0 + _Z95) / (1 - a * (z0 + _Z95)))
    r1 = min(max(math.ceil(a1 * _B), 1), _B)
    r2 = min(max(math.ceil(a2 * _B), 1), _B)
    assert row["n_days"] == n
    assert row["point_mean_dollars"] == s_tot // n
    assert row["z0_bias"] == pytest.approx(z0, abs=1e-3)
    assert row["acceleration"] == pytest.approx(a, abs=1e-5)
    assert row["lo_bca_dollars"] == ranked[r1 - 1][0] // n
    assert row["hi_bca_dollars"] == ranked[r2 - 1][0] // n
    assert row["lo_pct_dollars"] == ranked[4][0] // n
    assert row["hi_pct_dollars"] == ranked[194][0] // n


def test_bca_reduction_law():
    # z0 = 0, a = 0: levels collapse to plain percentile 2.5/97.5
    z0, a = 0.0, 0.0
    a1 = _phi(z0 + (z0 - _Z95) / (1 - a * (z0 - _Z95)))
    a2 = _phi(z0 + (z0 + _Z95) / (1 - a * (z0 + _Z95)))
    assert a1 == pytest.approx(0.025, abs=1e-9)
    assert a2 == pytest.approx(0.975, abs=1e-9)


def test_pk_matches_loop(spark, sf_dir):
    row = q_pollaczek_khinchine_wait(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "events")
        .select(
            F.unix_micros(convert_event_ts(F.col("ts"))).alias("us"),
            "value",
        )
        .collect()
    )
    us = [r["us"] for r in rows]
    sv = [round(r["value"] * 100) for r in rows]
    n = len(us)
    lam = (n - 1) / ((max(us) - min(us)) / 1e6)
    es = sum(sv) / 100 / n
    es2 = sum(v * v for v in sv) / 1e4 / n
    rho = lam * es
    assert row["n_arrivals"] == n
    assert row["lambda_per_sec"] == pytest.approx(lam, abs=5e-7)
    assert row["utilization"] == pytest.approx(rho, abs=1e-5)
    assert row["wq_mg1_sec"] == pytest.approx(
        lam * es2 / (2 * (1 - rho)), rel=1e-4
    )
    assert row["wq_mm1_sec"] == pytest.approx(
        rho * es / (1 - rho), rel=1e-4
    )
    cs2 = (es2 - es * es) / (es * es)
    assert row["pk_service_factor"] == pytest.approx((1 + cs2) / 2, abs=1e-5)
    # consistency: Wq_MG1 == Wq_MM1 * (1 + CV^2)/2
    assert row["wq_mg1_sec"] == pytest.approx(
        row["wq_mm1_sec"] * row["pk_service_factor"], abs=0.01
    )


def test_pk_service_distribution_laws():
    lam, es = 0.5, 1.0
    rho = lam * es
    # exponential service: E[S^2] = 2 E[S]^2 -> PK == MM1
    wq_exp = lam * (2 * es * es) / (2 * (1 - rho))
    wq_mm1 = rho * es / (1 - rho)
    assert wq_exp == pytest.approx(wq_mm1, abs=1e-12)
    # deterministic service: E[S^2] = E[S]^2 -> half the MM1 wait
    wq_det = lam * (es * es) / (2 * (1 - rho))
    assert wq_det == pytest.approx(wq_mm1 / 2, abs=1e-12)


def test_mover_stayer_matches_loop(spark, sf_dir):
    row = q_mover_stayer_split(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate")
        .collect()
    )
    months = sorted({str(r["o_orderdate"])[:7] for r in rows})
    t_of = {m: i + 1 for i, m in enumerate(months)}
    mm = len(months)
    active = {(r["o_custkey"], t_of[str(r["o_orderdate"])[:7]]) for r in rows}
    base = [(c, t) for c, t in active if t <= mm - 2]
    n1 = sum(1 for c, t in base if (c, t + 1) in active)
    n2 = sum(
        1 for c, t in base if (c, t + 1) in active and (c, t + 2) in active
    )
    q1, q22 = n1 / len(base), n2 / len(base)
    s = (q1 * q1 - q22) / (2 * q1 - q22 - 1)
    assert row["n_active_months"] == len(base)
    assert row["n_stay1"] == n1
    assert row["n_stay2"] == n2
    assert row["q_stay_1step"] == pytest.approx(q1, abs=1e-6)
    assert row["q_stay_2step"] == pytest.approx(q22, abs=1e-6)
    assert row["stayer_share"] == pytest.approx(s, abs=1e-4)
    if s < 1:
        assert row["mover_persistence"] == pytest.approx(
            (q1 - s) / (1 - s), abs=1e-4
        )


def test_mover_stayer_laws():
    # homogeneity: q22 == q1^2 -> s == 0
    q1 = 0.6
    q22 = q1 * q1
    s = (q1 * q1 - q22) / (2 * q1 - q22 - 1)
    assert s == pytest.approx(0.0, abs=1e-12)
    # a true 2-mixture always has q22 >= q1^2 (Jensen), recovering s
    s_true, p = 0.3, 0.5
    q1m = s_true + (1 - s_true) * p
    q22m = s_true + (1 - s_true) * p * p
    assert q22m >= q1m * q1m
    s_hat = (q1m * q1m - q22m) / (2 * q1m - q22m - 1)
    assert s_hat == pytest.approx(s_true, abs=1e-12)
