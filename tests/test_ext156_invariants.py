"""ext156: literal re-derivations -- the Cox partial-likelihood Newton
walk in raw Python floats (risk sets by brute force), a
planted-hazard fixture proving the sign convention, and the MCF from
a per-age loop."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext156 import (
    _COX_ROUNDS,
    q_cox_ph_newton,
    q_mean_cumulative_function,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)


def _cox_newton(obs, rounds=_COX_ROUNDS):
    """obs: list of (t, ev, x). Breslow ties, beta0 = 0."""
    beta = 0.0
    times = sorted({t for t, ev, _ in obs if ev})
    for _ in range(rounds):
        u = info = 0.0
        for td in times:
            risk = [(x,) for t, _, x in obs if t >= td]
            w = [math.exp(beta * x) for (x,) in risk]
            sw = sum(w)
            sxw = sum(x * wi for (x,), wi in zip(risk, w))
            sxxw = sum(x * x * wi for (x,), wi in zip(risk, w))
            d = sum(1 for t, ev, _ in obs if ev and t == td)
            sxd = sum(x for t, ev, x in obs if ev and t == td)
            u += sxd - d * sxw / sw
            info += d * (sxxw / sw - (sxw / sw) ** 2)
        beta += u / info
    return beta


def test_cox_matches_literal_newton(spark, sf_dir):
    row = q_cox_ph_newton(spark, sf_dir).collect()[0]
    ev = (
        convert_event_ts(read_table(spark, sf_dir, "events"))
        .select("user_id", "ts", "event_type")
        .collect()
    )
    first, last, pday, cnt = {}, {}, {}, defaultdict(int)
    for r in ev:
        u, d = r["user_id"], r["ts"].date()
        first[u] = min(first.get(u, d), d)
        last[u] = max(last.get(u, d), d)
        cnt[u] += 1
        if r["event_type"] == "purchase":
            pday[u] = min(pday.get(u, d), d)
    n = len(first)
    s = sum(cnt.values())
    ss = sum(c * c for c in cnt.values())
    mu = s / n
    sd = math.sqrt(n * ss - s * s) / n
    obs = []
    for u in first:
        t = (
            (pday[u] - first[u]).days
            if u in pday
            else (last[u] - first[u]).days
        )
        obs.append((t, 1 if u in pday else 0, (cnt[u] - mu) / sd))
    beta = _cox_newton(obs)
    assert row["n_users"] == n
    assert row["n_events"] == sum(e for _, e, _ in obs)
    # e9 quantization of the per-time folds -> ~1e-5 agreement
    assert row["cox_beta_per_sd"] == pytest.approx(beta, abs=1e-4)
    assert row["hazard_ratio_per_sd"] == pytest.approx(
        math.exp(beta), rel=1e-4
    )


def test_cox_sign_convention_on_planted_hazard():
    # high-x subjects fail EARLY -> beta must come out positive
    obs = []
    for i in range(60):
        x = 1.0 if i % 2 == 0 else -1.0
        t = 5 + (0 if x > 0 else 10) + (i % 5)
        obs.append((t, 1, x))
    beta = _cox_newton(obs, rounds=5)
    assert beta > 0.5


def test_mcf_matches_loop(spark, sf_dir):
    got = {
        r["account_age_days"]: r
        for r in q_mean_cumulative_function(spark, sf_dir).collect()
    }
    ev = (
        convert_event_ts(read_table(spark, sf_dir, "events"))
        .select("user_id", "ts", "event_type")
        .collect()
    )
    first, last = {}, {}
    purch = []
    for r in ev:
        u, d = r["user_id"], r["ts"].date()
        first[u] = min(first.get(u, d), d)
        last[u] = max(last.get(u, d), d)
    for r in ev:
        if r["event_type"] == "purchase":
            purch.append((r["user_id"], r["ts"].date()))
    mcf = 0.0
    for age in range(0, 29):
        at_risk = sum(
            1 for u in first if (last[u] - first[u]).days >= age
        )
        n_ev = sum(1 for u, d in purch if (d - first[u]).days == age)
        mcf += math.floor(1e9 * n_ev / at_risk + 0.5) / 1e9
        row = got[age]
        assert row["n_at_risk"] == at_risk
        assert row["n_events"] == n_ev
        assert row["mcf_purchases_per_user"] == pytest.approx(mcf, abs=1e-6)
    # MCF is nondecreasing
    vals = [got[a]["mcf_purchases_per_user"] for a in range(0, 29)]
    assert vals == sorted(vals)
