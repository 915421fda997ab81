"""Definition-level checks for ext100: literal pandas synthetic
control, per-cut DiD cells, and the full placebo-effect ranking."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext100 import (
    _PLACEBO_CUTS,
    _TREATED_NATION,
    _TRUE_CUT,
    q_placebo_timing_did,
    q_randomization_inference_did,
    q_synthetic_control_nn,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _monthly(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    j["m"] = pd.to_datetime(j.o_orderdate).dt.to_period("M").dt.to_timestamp()
    g = j.groupby(["c_nationkey", "m"]).cents.sum().reset_index()
    g["rev"] = g.cents // 100
    return g[["c_nationkey", "m", "rev"]].rename(columns={"c_nationkey": "nk"})


def test_synthetic_control_definition(spark, sf_dir):
    row = q_synthetic_control_nn(spark, sf_dir).collect()[0]
    g = _monthly(spark, sf_dir)
    cut = pd.Timestamp(_TRUE_CUT)
    tr = g[g.nk == _TREATED_NATION].set_index("m").rev
    best = None
    for nk, grp in g[g.nk != _TREATED_NATION].groupby("nk"):
        d = grp.set_index("m").rev
        common = tr.index.intersection(d.index)
        pre = common[common < cut]
        post = common[common >= cut]
        if len(pre) == 0 or len(post) == 0:
            continue
        ssd = int(((tr[pre] - d[pre]) ** 2).sum())
        key = (ssd / len(pre), nk)
        if best is None or key < best[0]:
            best = (key, nk, pre, post, d, ssd)
    _, nk, pre, post, d, ssd = best
    assert row["donor_nation"] == nk
    assert row["n_pre_months"] == len(pre)
    assert abs(row["pre_rmse_dollars"] - np.sqrt(ssd / len(pre))) < 0.02
    raw = (tr[post] - d[post]).mean()
    adj = raw - (tr[pre] - d[pre]).mean()
    assert abs(row["raw_post_gap_dollars"] - raw) < 0.02
    assert abs(row["adjusted_att_dollars"] - adj) < 0.02


def _did(g, cut):
    cut = pd.Timestamp(cut)
    w = g[(g.m >= cut - pd.DateOffset(months=12)) & (g.m < cut + pd.DateOffset(months=12))]
    t, c = w[w.nk == _TREATED_NATION], w[w.nk != _TREATED_NATION]
    return (
        t[t.m >= cut].rev.mean() - t[t.m < cut].rev.mean()
    ) - (c[c.m >= cut].rev.mean() - c[c.m < cut].rev.mean())


def test_placebo_timing_definition(spark, sf_dir):
    rows = {r["cutoff"]: r for r in q_placebo_timing_did(spark, sf_dir).collect()}
    g = _monthly(spark, sf_dir)
    assert sorted(rows) == sorted([_TRUE_CUT, *_PLACEBO_CUTS])
    for cut in [_TRUE_CUT, *_PLACEBO_CUTS]:
        expect = _did(g, cut)
        got = rows[cut]["did_effect_dollars"]
        if got is None:
            assert np.isnan(expect)  # empty cell at tiny SF
        else:
            assert abs(got - expect) < 0.02
        kind = "true-treatment" if cut == _TRUE_CUT else "placebo"
        assert rows[cut]["kind"] == kind


def test_randomization_inference_definition(spark, sf_dir):
    row = q_randomization_inference_did(spark, sf_dir).collect()[0]
    g = _monthly(spark, sf_dir)
    cut = pd.Timestamp(_TRUE_CUT)
    w = g[(g.m >= cut - pd.DateOffset(months=12)) & (g.m < cut + pd.DateOffset(months=12))]
    effects = {}
    for nk in sorted(w.nk.unique()):
        t, c = w[w.nk == nk], w[w.nk != nk]
        effects[nk] = (
            t[t.m >= cut].rev.mean() - t[t.m < cut].rev.mean()
        ) - (c[c.m >= cut].rev.mean() - c[c.m < cut].rev.mean())
    te = effects[_TREATED_NATION]
    n_ge = sum(1 for e in effects.values() if abs(e) >= abs(te))
    assert row["n_nations"] == len(effects)
    assert abs(row["true_effect_dollars"] - te) < 0.02
    assert row["n_placebos_ge"] == n_ge
    assert abs(row["ri_p_value"] - n_ge / len(effects)) < 1e-4
    assert abs(row["max_abs_effect_dollars"] - max(abs(e) for e in effects.values())) < 0.02
    # the true nation always counts itself
    assert row["n_placebos_ge"] >= 1
