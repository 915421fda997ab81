"""ext143: literal re-derivations -- Kuiper's V from a sorted
time-of-day loop, Newcombe's MOVER interval from independently coded
Wilson bounds, Nigrini MAD from a digit Counter."""

from __future__ import annotations

import math
from collections import Counter
from statistics import NormalDist

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext143 import (
    q_benford_mad_conformity,
    q_kuiper_time_of_day,
    q_newcombe_risk_diff_ci,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)


def test_kuiper_matches_literal(spark, sf_dir):
    row = q_kuiper_time_of_day(spark, sf_dir).collect()[0]
    ev = convert_event_ts(read_table(spark, sf_dir, "events")).select("ts").collect()
    sods = Counter(
        (int(r["ts"].timestamp() * 1e6) // 60_000_000) % 1440 for r in ev
    )
    n = sum(sods.values())
    cum = 0
    d_plus = d_minus = -1.0
    for s in sorted(sods):
        lo = cum / n
        cum += sods[s]
        hi = cum / n
        d_plus = max(d_plus, hi - s / 1440)
        d_minus = max(d_minus, (s + 1) / 1440 - lo)
    v = d_plus + d_minus
    vstar = v * (math.sqrt(n) + 0.155 + 0.24 / math.sqrt(n))
    assert row["n_events"] == n
    assert row["kuiper_v"] == pytest.approx(v, abs=1e-6)
    assert row["v_star"] == pytest.approx(vstar, abs=1e-5)
    assert row["reject_5pct"] == (vstar > 1.747)


def _wilson_bounds(x, n, z):
    p = x / n
    mid = p + z * z / (2 * n)
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    den = 1 + z * z / n
    return (mid - half) / den, (mid + half) / den


def test_newcombe_matches_literal(spark, sf_dir):
    row = q_newcombe_risk_diff_ci(spark, sf_dir).collect()[0]
    ev = convert_event_ts(read_table(spark, sf_dir, "events")).select(
        "ts", "event_type"
    ).collect()
    x1 = n1 = x2 = n2 = 0
    for r in ev:
        we = r["ts"].weekday() >= 5  # python: Mon=0..Sun=6
        err = r["event_type"] == "error"
        if we:
            n1 += 1
            x1 += err
        else:
            n2 += 1
            x2 += err
    z = NormalDist().inv_cdf(0.975)
    p1, p2 = x1 / n1, x2 / n2
    l1, u1 = _wilson_bounds(x1, n1, z)
    l2, u2 = _wilson_bounds(x2, n2, z)
    d = p1 - p2
    lo = d - math.sqrt((p1 - l1) ** 2 + (u2 - p2) ** 2)
    hi = d + math.sqrt((u1 - p1) ** 2 + (p2 - l2) ** 2)
    assert (row["n_weekend"], row["errors_weekend"]) == (n1, x1)
    assert (row["n_weekday"], row["errors_weekday"]) == (n2, x2)
    assert row["risk_diff"] == pytest.approx(d, abs=1e-6)
    assert row["ci_lo"] == pytest.approx(lo, abs=1e-6)
    assert row["ci_hi"] == pytest.approx(hi, abs=1e-6)
    assert row["ci_lo"] < row["risk_diff"] < row["ci_hi"]


def test_newcombe_stays_in_bounds_at_extremes():
    # Wald would exceed [-1, 1] at x = 0 / x = n; MOVER must not
    z = NormalDist().inv_cdf(0.975)
    l1, u1 = _wilson_bounds(0, 10, z)
    l2, u2 = _wilson_bounds(10, 10, z)
    d = 0 / 10 - 10 / 10
    lo = d - math.sqrt((0 - l1) ** 2 + (u2 - 1) ** 2)
    hi = d + math.sqrt((u1 - 0) ** 2 + (1 - l2) ** 2)
    assert -1 <= lo < hi <= 1 + 1e-12


def test_benford_mad_matches_literal(spark, sf_dir):
    rows = q_benford_mad_conformity(spark, sf_dir).collect()
    orders = read_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    digits = Counter(
        int(str(round(r["o_totalprice"] * 100))[0])
        for r in orders
        if r["o_totalprice"] > 0
    )
    n = sum(digits.values())
    mad = sum(
        abs(digits.get(d, 0) / n - math.log10(1 + 1 / d)) for d in range(1, 10)
    ) / 9
    assert len(rows) == 9
    for r in rows:
        d = r["digit"]
        assert r["n_d"] == digits.get(d, 0)
        assert r["observed_prop"] == pytest.approx(digits.get(d, 0) / n, abs=1e-6)
        assert r["benford_prop"] == pytest.approx(math.log10(1 + 1 / d), abs=1e-6)
        assert r["mad"] == pytest.approx(mad, abs=1e-6)
        bands = [(0.006, "close"), (0.012, "acceptable"), (0.015, "marginal")]
        verdict = next((v for t, v in bands if mad < t), "nonconformity")
        assert r["nigrini_verdict"] == verdict
