"""Definition-level checks for the ext71 batch."""

from __future__ import annotations

import math

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext71 import (
    _ALLAN_MS,
    q_allan_variance,
    q_mean_residual_life,
    q_taylors_power_law,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_taylor_matches_literal_loglog_fit(spark, sf_dir):
    row = q_taylors_power_law(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity"
    ).toPandas()
    pts = []
    for _, g in li.groupby("l_partkey"):
        q = g.l_quantity.astype(int).to_numpy()
        n = len(q)
        if n < 5:
            continue
        s1, s2 = int(q.sum()), int((q.astype(object) * q).sum())
        if n * s2 <= s1 * s1:
            continue
        mean = s1 / n
        var = (n * s2 - s1 * s1) / (n * n)
        pts.append(
            (
                int(math.floor(1e6 * math.log(mean) + 0.5)),
                int(math.floor(1e6 * math.log(var) + 0.5)),
            )
        )
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    b = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    ln_a = (sy - b * sx) / k / 1e6
    assert row["n_parts"] == k
    assert abs(row["taylor_b"] - b) < 1e-6
    assert abs(row["ln_a"] - ln_a) < 1e-6
    # Taylor exponents live between the Poisson and clustered regimes
    assert 0.0 < row["taylor_b"] < 3.0


def test_allan_matches_literal_blocks(spark, sf_dir):
    got = {r["m_gaps"]: r for r in q_allan_variance(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("ts", "event_id").toPandas()
    ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
    us = (ev.ts.astype("int64") // 1000).to_numpy()  # ns -> us
    gaps = np.diff(us).astype(object)
    for m in _ALLAN_MS:
        nb = len(gaps) // m
        means = [sum(gaps[b * m : (b + 1) * m]) / m for b in range(nb)]
        d2 = [
            int(math.floor(((means[i + 1] - means[i]) / 1000.0) ** 2 + 0.5))
            for i in range(nb - 1)
        ]
        r = got[m]
        assert r["n_pairs"] == len(d2)
        avar = sum(d2) / (2 * len(d2))
        # the query reports the exact floor((10 S)/(2 n))/10 truncation
        assert abs(r["avar_ms2"] - (10 * sum(d2)) // (2 * len(d2)) / 10) < 1e-9
        assert abs(r["avar_ms2"] - avar) <= 0.1
        assert abs(r["adev_ms"] - math.sqrt(avar)) < 1e-6
    # pooled events arrive ~independently: ADEV must shrink as m grows
    assert got[_ALLAN_MS[-1]]["adev_ms"] < got[_ALLAN_MS[0]]["adev_ms"]


def test_rmst_matches_literal_km_area(spark, sf_dir):
    row = q_mean_residual_life(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).toPandas()
    ev["day"] = ev.ts.dt.normalize()
    obs = []
    for _, g in ev.groupby("user_id"):
        first, last = g.day.min(), g.day.max()
        p = g[g.event_type == "purchase"].day.min()
        if p == p:  # not NaT
            obs.append(((p - first).days, 1))
        else:
            obs.append(((last - first).days, 0))
    n = len(obs)
    tau = max(t for t, _ in obs)
    times = sorted({t for t, e in obs if e == 1 or True})
    # KM over event times (d > 0 only), exact e8-int log accumulation
    ended = 0
    cum_le8 = 0
    dead = False
    surv_steps = []  # (t, S_after_t rounded to 6)
    for t in sorted({t for t, _ in obs}):
        n_risk = n - ended
        d = sum(1 for tt, e in obs if tt == t and e == 1)
        ending = sum(1 for tt, _ in obs if tt == t)
        ended += ending
        if d == 0:
            continue
        if d >= n_risk:
            dead = True
        if not dead:
            cum_le8 += int(math.floor(math.log(1 - d / n_risk) * 1e8 + 0.5))
            s = round(math.exp(cum_le8 / 1e8), 6)
        else:
            s = 0.0
        surv_steps.append((t, s))
    area = surv_steps[0][0]  # S = 1 before the first event day
    for i, (t, s) in enumerate(surv_steps):
        t_next = surv_steps[i + 1][0] if i + 1 < len(surv_steps) else tau
        area += s * (t_next - t)
    assert row["n_users"] == n
    assert row["horizon_days"] == tau
    assert abs(row["rmst_days"] - area) < 1e-6
    # RMST is an average survival time: inside [0, horizon]
    assert 0.0 <= row["rmst_days"] <= tau
