"""Definition-level checks for ext97: literal state labeling +
2x2 fundamental matrix, renewal-theory identity, and gap moments."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext97 import (
    _CHAIN_YEARS,
    q_absorbing_chain_lifetime,
    q_error_interarrival_stats,
    q_inspection_paradox,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_absorbing_chain_definition(spark, sf_dir):
    row = q_absorbing_chain_lifetime(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    ).toPandas()
    o["y"] = pd.to_datetime(o.o_orderdate).dt.year
    o = o[o.y.isin(_CHAIN_YEARS)]
    active = o.groupby("o_custkey").y.apply(set)
    counts = {}
    for ck, ys in active.items():
        fy, ly = min(ys), max(ys)
        states = {}
        for y in _CHAIN_YEARS:
            if y < fy:
                continue
            states[y] = "A" if y in ys else ("C" if y > ly else "D")
        for y in _CHAIN_YEARS[:-1]:
            if y in states and (y + 1) in states and states[y] in "AD":
                counts[(states[y], states[y + 1])] = (
                    counts.get((states[y], states[y + 1]), 0) + 1
                )
    na = sum(c for (f, _), c in counts.items() if f == "A")
    nd = sum(c for (f, _), c in counts.items() if f == "D")
    qaa = counts.get(("A", "A"), 0) / na
    qad = counts.get(("A", "D"), 0) / na
    qda = counts.get(("D", "A"), 0) / nd
    qdd = counts.get(("D", "D"), 0) / nd
    det = (1 - qaa) * (1 - qdd) - qad * qda
    assert row["n_from_active"] == na and row["n_from_dormant"] == nd
    assert abs(row["p_stay_active"] - qaa) < 1e-5
    assert abs(row["p_go_dormant"] - qad) < 1e-5
    assert abs(row["p_reactivate"] - qda) < 1e-5
    ea = ((1 - qdd) + qad) / det
    ed = (qda + (1 - qaa)) / det
    assert abs(row["exp_years_from_active"] - ea) < 1e-3
    assert abs(row["exp_years_from_dormant"] - ed) < 1e-3
    # the fundamental matrix equals the numpy inverse
    q = np.array([[qaa, qad], [qda, qdd]])
    n_mat = np.linalg.inv(np.eye(2) - q)
    assert abs(ea - n_mat[0].sum()) < 1e-9
    assert abs(ed - n_mat[1].sum()) < 1e-9
    # structural property of the retrospective labeling: Dormant
    # requires a FUTURE active year, so D can never absorb directly
    assert abs((qda + qdd) - 1.0) < 1e-9


def test_inspection_paradox_definition(spark, sf_dir):
    row = q_inspection_paradox(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).toPandas()
    o["dt"] = pd.to_datetime(o.o_orderdate)
    o = o.sort_values(["o_custkey", "dt", "o_orderkey"])
    o["pdt"] = o.groupby("o_custkey").dt.shift()
    gaps = o.dropna(subset=["pdt"]).copy()
    gaps["g"] = (gaps.dt - gaps.pdt).dt.days
    gaps = gaps[gaps.g > 0]
    g = gaps.g.to_numpy().astype("float64")
    assert row["n_gaps"] == len(g)
    assert abs(row["mean_gap_days"] - g.mean()) < 1e-3
    lb = (g**2).sum() / g.sum()
    assert abs(row["length_biased_pred_days"] - lb) < 1e-3
    t = o.dt.max() - pd.Timedelta(days=180)
    st = gaps[(gaps.pdt <= t) & (gaps.dt > t)]
    assert row["n_straddling"] == len(st)
    obs = st.g.mean()
    assert abs(row["observed_straddle_days"] - obs) < 1e-3
    assert abs(row["obs_over_pred"] - obs / lb) < 1e-3
    # the paradox: straddling gaps are longer than the plain mean
    assert row["observed_straddle_days"] > row["mean_gap_days"]


def test_error_interarrival_definition(spark, sf_dir):
    row = q_error_interarrival_stats(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    ).toPandas()
    errs = ev[ev.event_type == "error"].sort_values(["ts", "event_id"])
    us = (pd.to_datetime(errs.ts).astype("int64") // 1000).to_numpy()
    g = np.diff(us).astype("float64")
    assert row["n_errors"] == len(errs)
    assert row["n_gaps"] == len(g)
    assert abs(row["mtbf_hours"] - g.mean() / 1e6 / 3600) < 1e-3
    assert abs(row["gap_cv"] - g.std(ddof=0) / g.mean()) < 1e-4
    assert abs(row["error_rate"] - len(errs) / len(ev)) < 1e-6
