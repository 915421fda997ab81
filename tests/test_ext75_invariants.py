"""Definition-level checks for the ext75 regression-diagnostics batch:
re-derive each statistic from first principles in numpy on the same
daily series and require agreement with the query output (the oracle
can't catch a formulation bug both engines share -- these can)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext75 import (
    q_breusch_pagan,
    q_cooks_distance_topk,
    q_durbin_watson,
    q_jarque_bera,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _daily(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    d = (
        pd.DataFrame({"dt": o.o_orderdate, "y": cents})
        .groupby("dt", as_index=False)["y"]
        .sum()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    return d


def _fit(d):
    n = len(d)
    t = np.arange(1, n + 1, dtype="int64")
    y = d.y.to_numpy()
    st, sy = int(t.sum()), int(y.sum())
    stt = int((t.astype(object) * t).sum())
    sty = int((t.astype(object) * y).sum())
    b = float(n * sty - st * sy) / float(n * stt - st * st)
    a = (float(sy) - b * float(st)) / float(n)
    return n, t, y, a, b, st, stt


def test_durbin_watson_definition(spark, sf_dir):
    row = q_durbin_watson(spark, sf_dir).collect()[0]
    d = _daily(spark, sf_dir)
    n, t, y, a, b, _, _ = _fit(d)
    ed = np.floor((y.astype("float64") - a - b * t) / 100.0 + 0.5).astype("int64")
    see = int((ed.astype(object) * ed).sum())
    diffs = np.diff(ed)
    sdd = int((diffs.astype(object) * diffs).sum())
    assert row["n_days"] == n
    assert row["dw_stat"] == round(sdd / see, 6)
    # a trend-removed series keeps DW in the sane band
    assert 0.0 < row["dw_stat"] < 4.0
    assert abs(row["rho_hat"] - (1 - row["dw_stat"] / 2)) < 2e-6


def test_jarque_bera_definition(spark, sf_dir):
    row = q_jarque_bera(spark, sf_dir).collect()[0]
    d = _daily(spark, sf_dir)
    y = d.y.to_numpy().astype("float64")
    n = len(y)
    m1 = y.mean()
    m2 = ((y - m1) ** 2).mean()
    m3 = ((y - m1) ** 3).mean()
    m4 = ((y - m1) ** 4).mean()
    skew = m3 / m2**1.5
    exk = m4 / m2**2 - 3
    jb = n / 6 * (skew**2 + exk**2 / 4)
    assert row["n_days"] == n
    assert abs(row["skewness"] - skew) < 1e-4
    assert abs(row["excess_kurtosis"] - exk) < 1e-4
    assert abs(row["jb_stat"] - jb) < max(1e-2, 1e-4 * jb)


def test_cooks_distance_definition(spark, sf_dir):
    got = q_cooks_distance_topk(spark, sf_dir).collect()
    d = _daily(spark, sf_dir)
    n, t, y, a, b, st, stt = _fit(d)
    ec = np.floor(y.astype("float64") - a - b * t + 0.5).astype("int64")
    sse = float((ec.astype(object) * ec).sum())
    s2 = sse / (n - 2)
    tbar = st / n
    denom = float(stt) - float(st) * st / n
    h = 1.0 / n + (t - tbar) ** 2 / denom
    cd = ec.astype("float64") ** 2 * h / (2 * s2 * (1 - h) ** 2)
    order = np.lexsort((d.dt.astype(str).to_numpy(), -cd))[:5]
    assert len(got) == 5
    for row, i in zip(got, order):
        assert row["dt"] == str(d.dt.iloc[i])[:10]
        assert row["residual_dollars"] == round(ec[i] / 100, 2) + 0.0
        assert abs(row["leverage"] - h[i]) < 5.1e-7
        assert abs(row["cooks_d"] - cd[i]) < 1e-6
    # leverage is bounded by the hat-matrix identity
    assert all(1.0 / n <= r["leverage"] <= 1.0 for r in got)


def test_breusch_pagan_definition(spark, sf_dir):
    row = q_breusch_pagan(spark, sf_dir).collect()[0]
    d = _daily(spark, sf_dir)
    n, t, y, a, b, _, _ = _fit(d)
    ed = np.floor((y.astype("float64") - a - b * t) / 100.0 + 0.5).astype("int64")
    y2 = ed.astype(object) * ed
    sx = int(t.sum())
    sxx = int((t.astype(object) * t).sum())
    sy2 = int(y2.sum())
    sxy = int((t.astype(object) * y2).sum())
    syy = int((y2 * y2).sum())
    num = float(n * sxy - sx * sy2)
    r2 = num * num / (float(n * sxx - sx * sx) * float(n * syy - sy2 * sy2))
    assert row["n_days"] == n
    assert abs(row["aux_r2"] - r2) < 1e-6
    assert abs(row["bp_stat"] - n * r2) < 1e-2
    assert 0.0 <= row["aux_r2"] <= 1.0
    assert row["variance_trend"] in ("increasing", "non-increasing")
    assert (row["variance_trend"] == "increasing") == (num > 0)
