"""Definition-level checks for ext105: literal per-error recovery
scan, histogram-curvature knee, and a time-weighted level sweep."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext105 import (
    q_concurrency_time_percentiles,
    q_error_recovery_time,
    q_session_timeout_knee,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_error_recovery_definition(spark, sf_dir):
    row = q_error_recovery_time(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).toPandas()
    ev["us"] = pd.to_datetime(ev.ts).astype("int64") // 1000
    gaps = []
    n_err = 0
    for uid, grp in ev.groupby("user_id"):
        errs = grp[grp.event_type == "error"].us.to_numpy()
        pur = np.sort(grp[grp.event_type == "purchase"].us.to_numpy())
        n_err += len(errs)
        for e in errs:
            i = np.searchsorted(pur, e, side="right")
            if i < len(pur):
                gaps.append(int(pur[i] - e))
    assert row["n_errors"] == n_err
    assert row["n_recovered"] == len(gaps)
    assert abs(row["recovery_rate"] - len(gaps) / n_err) < 1e-6
    g = np.array(gaps, dtype="float64")
    assert abs(row["mean_recovery_minutes"] - g.mean() / 60e6) < 0.05
    mins = np.sort(g // 60e6).astype("int64")
    cc = np.arange(1, len(mins) + 1)
    med = int(mins[np.argmax(2 * cc >= len(mins))])
    assert row["median_recovery_minutes"] == med


def test_session_knee_definition(spark, sf_dir):
    row = q_session_timeout_knee(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    ).toPandas()
    ev["us"] = pd.to_datetime(ev.ts).astype("int64") // 1000
    ev = ev.sort_values(["user_id", "us", "event_id"])
    ev["pus"] = ev.groupby("user_id").us.shift()
    g = ev.dropna(subset=["pus"])
    g = g[g.us > g.pus]
    b = np.floor(np.log2((g.us - g.pus) / 60e6 + 1.0)).astype("int64")
    hist = pd.Series(b).value_counts().sort_index()
    scored = []
    for bb in hist.index:
        if (bb - 1) in hist.index and (bb + 1) in hist.index:
            l0 = math.floor(1e9 * math.log(hist[bb]) + 0.5)
            lp = math.floor(1e9 * math.log(hist[bb + 1]) + 0.5)
            ln_ = math.floor(1e9 * math.log(hist[bb - 1]) + 0.5)
            scored.append((bb, (lp - l0) - (l0 - ln_)))
    best = max(scored, key=lambda t: (t[1], -t[0]))
    assert row["knee_bucket"] == best[0]
    assert abs(row["log_count_curvature"] - best[1] / 1e9) < 1e-3
    assert row["bucket_lo_minutes"] == round(2 ** best[0] - 1)
    assert row["bucket_hi_minutes"] == round(2 ** (best[0] + 1) - 1)


def test_concurrency_percentiles_definition(spark, sf_dir):
    row = q_concurrency_time_percentiles(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).toPandas()
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    sp = j.groupby(["o_orderkey", "o_orderdate"]).l_shipdate.max().reset_index()
    sp = sp[pd.to_datetime(sp.l_shipdate) > pd.to_datetime(sp.o_orderdate)]
    deltas = {}
    for r in sp.itertuples():
        st = pd.Timestamp(r.o_orderdate)
        en = pd.Timestamp(r.l_shipdate)
        deltas[st] = deltas.get(st, 0) + 1
        deltas[en] = deltas.get(en, 0) - 1
    days = sorted(deltas)
    lvl = 0
    weights = {}
    for i, d in enumerate(days[:-1]):
        lvl += deltas[d]
        dur = (days[i + 1] - d).days
        weights[lvl] = weights.get(lvl, 0) + dur
    tw = sum(weights.values())
    assert row["total_days"] == tw
    levels = sorted(weights)
    cw = np.cumsum([weights[l] for l in levels])
    for p, col in [(50, "p50_open"), (90, "p90_open"), (99, "p99_open")]:
        idx = int(np.argmax(100 * cw >= p * tw))
        assert row[col] == levels[idx]
    assert row["max_open"] == max(levels)
    assert row["p50_open"] <= row["p90_open"] <= row["p99_open"] <= row["max_open"]
