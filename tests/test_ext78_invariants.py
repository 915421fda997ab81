"""Definition-level checks for ext78: literal pandas/numpy
re-derivations of MASE / Theil U2 / tracking signal, the pinball loss
on per-weekday quantiles, and the event-study CAR."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext78 import (
    _PINBALL_PCTS,
    _TEST_DAYS,
    q_event_study_car,
    q_forecast_eval_suite,
    q_pinball_loss_dow,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _daily(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    d = (
        pd.DataFrame({"dt": pd.to_datetime(o.o_orderdate), "y": cents})
        .groupby("dt", as_index=False)["y"]
        .sum()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    return d


def test_forecast_eval_definition(spark, sf_dir):
    row = q_forecast_eval_suite(spark, sf_dir).collect()[0]
    d = _daily(spark, sf_dir)
    y = d.y.to_numpy()
    cutoff = d.dt.max() - pd.Timedelta(days=_TEST_DAYS)
    ln1 = np.concatenate(([0], y[:-1])).astype("int64")
    ln7 = np.concatenate(([0] * 7, y[:-7])).astype("int64")
    idx = np.arange(len(y))
    is_test = (d.dt > cutoff).to_numpy()
    is_train = (~is_test) & (idx >= 1)
    sae_naive = np.abs(y[is_train] - ln1[is_train]).sum()
    e7 = y[is_test] - ln7[is_test]
    e1 = y[is_test] - ln1[is_test]
    n_tr, n_te = int(is_train.sum()), int(is_test.sum())
    assert row["n_train"] == n_tr and row["n_test"] == n_te
    mase = (np.abs(e7).sum() / n_te) / (sae_naive / n_tr)
    assert abs(row["mase"] - mase) < 1e-5
    u2 = np.sqrt((e7.astype("float64") ** 2).sum() / (e1.astype("float64") ** 2).sum())
    assert abs(row["theil_u2"] - u2) < 1e-5
    ts = e7.sum() / (np.abs(e7).sum() / n_te)
    assert abs(row["tracking_signal"] - ts) < 1e-4
    assert abs(row["mean_bias_ratio"] - e7.sum() / np.abs(e7).sum()) < 1e-5
    # tracking signal is bounded by +-n_test by construction
    assert abs(row["tracking_signal"]) <= n_te


def test_pinball_loss_definition(spark, sf_dir):
    got = {r["quantile_pct"]: r for r in q_pinball_loss_dow(spark, sf_dir).collect()}
    d = _daily(spark, sf_dir)
    cutoff = d.dt.max() - pd.Timedelta(days=_TEST_DAYS)
    d["dow"] = d.dt.dt.dayofweek
    train, test = d[d.dt <= cutoff], d[d.dt > cutoff]
    assert sorted(got) == sorted(_PINBALL_PCTS)
    for pct in _PINBALL_PCTS:
        qs = {}
        for dow, grp in train.groupby("dow"):
            s = np.sort(grp.y.to_numpy())
            cc = np.arange(1, len(s) + 1)
            qs[dow] = int(s[np.argmax(100 * cc >= pct * len(s))])
        q = test.dow.map(qs).to_numpy()
        y = test.y.to_numpy()
        loss = np.where(y >= q, pct * (y - q), (100 - pct) * (q - y))
        r = got[pct]
        assert r["n_test"] == len(test)
        assert abs(r["avg_pinball_dollars"] - loss.mean() / 10000) < 1e-3
        assert abs(r["coverage"] - (y <= q).mean()) < 1e-6
    # coverage must increase with the quantile level
    assert got[10]["coverage"] <= got[50]["coverage"] <= got[90]["coverage"]


def test_event_study_definition(spark, sf_dir):
    rows = q_event_study_car(spark, sf_dir).collect()
    d = _daily(spark, sf_dir)
    # event day: max revenue, earliest date tiebreak
    top = d.sort_values(["y", "dt"], ascending=[False, True]).iloc[0]
    ed = top["dt"]
    est = d[(d.dt >= ed - pd.Timedelta(days=70)) & (d.dt <= ed - pd.Timedelta(days=11))]
    n_est, s_est = len(est), int(est.y.sum())
    win = d[(d.dt >= ed - pd.Timedelta(days=5)) & (d.dt <= ed + pd.Timedelta(days=5))]
    assert len(rows) == len(win)
    car = 0.0
    by_off = {int((r.dt - ed).days): int(r.y) for r in win.itertuples()}
    got_offsets = [r["offset_days"] for r in rows]
    assert got_offsets == sorted(by_off)
    for r in rows:
        ar = (n_est * by_off[r["offset_days"]] - s_est) / n_est / 100.0
        assert abs(r["abnormal_dollars"] - ar) < 0.011
        car += ar
        assert abs(r["car_dollars"] - car) < 0.02
    # the event day itself must be the largest abnormal value
    ar0 = next(r for r in rows if r["offset_days"] == 0)
    assert ar0["abnormal_dollars"] == max(r["abnormal_dollars"] for r in rows)
