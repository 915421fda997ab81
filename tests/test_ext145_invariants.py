"""ext145: literal KM re-derivations -- the survival curve, RMST
integral, cure fraction, and conditional ratios recomputed from a
plain per-user dictionary + sequential product loop (no e8-log
machinery), so a shared risk-set/step bug cannot hide."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext145 import (
    _TAU,
    q_conditional_survival_curve,
    q_cure_fraction_km,
    q_rmst_survival,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)


@pytest.fixture(scope="module")
def km(spark, sf_dir):
    ev = (
        convert_event_ts(read_table(spark, sf_dir, "events"))
        .select("user_id", "ts", "event_type")
        .collect()
    )
    first, last, pday = {}, {}, {}
    for r in ev:
        d = r["ts"].date()
        u = r["user_id"]
        first[u] = min(first.get(u, d), d)
        last[u] = max(last.get(u, d), d)
        if r["event_type"] == "purchase":
            pday[u] = min(pday.get(u, d), d)
    obs = []
    for u in first:
        if u in pday:
            obs.append(((pday[u] - first[u]).days, 1))
        else:
            obs.append(((last[u] - first[u]).days, 0))
    # KM product over event times
    end_at = Counter(t for t, _ in obs)
    d_at = Counter(t for t, e in obs if e)
    n = len(obs)
    at_risk = n
    curve = []  # (t, S after t)
    s = 1.0
    for t in sorted(end_at):
        if d_at.get(t, 0) > 0:
            if d_at[t] >= at_risk:
                s = 0.0
            else:
                s *= 1 - d_at[t] / at_risk
            curve.append((t, s))
        at_risk -= end_at[t]
    return obs, curve, n


def _s_at(curve, tau):
    s = 1.0
    for t, sv in curve:
        if t <= tau:
            s = sv
        else:
            break
    return s


def test_rmst_matches_integral(spark, sf_dir, km):
    obs, curve, n = km
    row = q_rmst_survival(spark, sf_dir).collect()[0]
    # integrate the step function to TAU
    area = 0.0
    prev_t, prev_s = 0, 1.0
    for t, s in curve:
        if t >= _TAU:
            break
        area += prev_s * (min(t, _TAU) - prev_t)
        prev_t, prev_s = t, s
    area += prev_s * (_TAU - prev_t)
    assert row["horizon_days"] == _TAU
    assert row["rmst_days"] == pytest.approx(area, abs=1e-4)
    assert row["conversion_time_share"] == pytest.approx(
        1 - area / _TAU, abs=1e-5
    )
    assert 0 <= row["rmst_days"] <= _TAU


def test_cure_fraction_matches_plateau(spark, sf_dir, km):
    obs, curve, n = km
    row = q_cure_fraction_km(spark, sf_dir).collect()[0]
    conv = sum(e for _, e in obs)
    assert row["n_users"] == n
    assert row["n_converted"] == conv
    assert row["naive_never_rate"] == pytest.approx(1 - conv / n, abs=1e-6)
    assert row["km_cure_fraction"] == pytest.approx(curve[-1][1], abs=1e-4)
    # KM corrects the naive rate DOWN (censored users carried risk)
    assert row["km_cure_fraction"] <= row["naive_never_rate"] + 1e-9


def test_conditional_survival_matches_ratios(spark, sf_dir, km):
    obs, curve, n = km
    rows = {
        r["given_unconverted_through_day"]: r
        for r in q_conditional_survival_curve(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 7, 14}
    for t0 in (0, 7, 14):
        s_t = _s_at(curve, t0)
        s_t7 = _s_at(curve, t0 + 7)
        r = rows[t0]
        assert r["s_at_t"] == pytest.approx(s_t, abs=1e-4)
        if s_t > 0:
            assert r["p_unconverted_7_more_days"] == pytest.approx(
                s_t7 / s_t, abs=1e-4
            )
            assert 0 <= r["p_unconverted_7_more_days"] <= 1 + 1e-9
        else:
            # risk set died out by t0: the condition has probability 0
            assert r["p_unconverted_7_more_days"] is None
