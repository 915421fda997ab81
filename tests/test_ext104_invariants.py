"""Definition-level checks for ext104: literal confusion cells per
group, a brute-force cost scan, and a literal decile-weight ESS."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext104 import (
    _EV_TEST_DAYS,
    _FN_COST,
    q_equalized_odds_gap,
    q_importance_weight_ess,
    q_optimal_threshold_cost,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _events(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts"
    ).toPandas()
    ev["v"] = np.floor(ev.value.to_numpy() * 100 + 0.5).astype("int64")
    ev["y"] = (ev.event_type == "purchase").astype(int)
    return ev


def test_equalized_odds_definition(spark, sf_dir):
    row = q_equalized_odds_gap(spark, sf_dir).collect()[0]
    ev = _events(spark, sf_dir)
    s = np.sort(ev.v.to_numpy())
    n = len(s)
    med = int(s[np.argmax(2 * np.arange(1, n + 1) >= n)])
    ev["pred"] = (ev.v > med).astype(int)
    ev["grp"] = (ev.user_id % 2).astype(int)
    stats = {}
    for g, grp in ev.groupby("grp"):
        tp = int(((grp.y == 1) & (grp.pred == 1)).sum())
        fn = int(((grp.y == 1) & (grp.pred == 0)).sum())
        fp = int(((grp.y == 0) & (grp.pred == 1)).sum())
        tn = int(((grp.y == 0) & (grp.pred == 0)).sum())
        stats[g] = (tp / (tp + fn), fp / (fp + tn))
    assert abs(row["tpr_group0"] - stats[0][0]) < 1e-6
    assert abs(row["tpr_group1"] - stats[1][0]) < 1e-6
    assert abs(row["tpr_gap"] - (stats[1][0] - stats[0][0])) < 2e-6
    assert abs(row["fpr_group0"] - stats[0][1]) < 1e-6
    assert abs(row["fpr_group1"] - stats[1][1]) < 1e-6
    assert abs(row["fpr_gap"] - (stats[1][1] - stats[0][1])) < 2e-6


def test_optimal_threshold_definition(spark, sf_dir):
    row = q_optimal_threshold_cost(spark, sf_dir).collect()[0]
    ev = _events(spark, sf_dir)
    v = ev.v.to_numpy()
    y = ev.y.to_numpy()
    pos, neg = np.sort(v[y == 1]), np.sort(v[y == 0])
    best = None
    for t in np.unique(v):
        fp = len(neg) - int(np.searchsorted(neg, t, side="left"))
        fn = int(np.searchsorted(pos, t, side="left"))
        cost = fp + _FN_COST * fn
        if best is None or (cost, t) < best[:2]:
            best = (cost, t, fp, fn)
    cost, t, fp, fn = best
    assert row["threshold_dollars"] == round(int(t) / 100, 2)
    assert row["n_false_pos"] == fp
    assert row["n_false_neg"] == fn
    assert row["total_cost"] == cost
    assert row["predict_none_cost"] == _FN_COST * len(pos)
    assert abs(row["cost_ratio"] - cost / (_FN_COST * len(pos))) < 1e-3
    # the chosen rule can never cost more than doing nothing
    assert row["total_cost"] <= row["predict_none_cost"]


def test_importance_weight_ess_definition(spark, sf_dir):
    row = q_importance_weight_ess(spark, sf_dir).collect()[0]
    ev = _events(spark, sf_dir)
    ev["ts"] = pd.to_datetime(ev.ts)
    co = ev.ts.max() - pd.Timedelta(days=_EV_TEST_DAYS)
    train = np.sort(ev[ev.ts <= co].v.to_numpy())
    test = ev[ev.ts > co].v.to_numpy()
    n, t = len(train), len(test)
    assert row["n_train"] == n and row["n_test"] == t
    # ntile(10) edges = max of each of the first 9 tiles
    base, rem = divmod(n, 10)
    edges = []
    start = 0
    for tile in range(1, 10):
        size = base + (1 if tile <= rem else 0)
        edges.append(int(train[start + size - 1]))
        start += size
    edges_arr = np.array(edges)

    def bin_of(x):
        return int((x > edges_arr).sum())

    nb = np.zeros(10, dtype="int64")
    tb = np.zeros(10, dtype="int64")
    for x in train:
        nb[bin_of(x)] += 1
    for x in test:
        tb[bin_of(x)] += 1
    mask = nb > 0
    ssum = (tb[mask].astype("float64") ** 2 / nb[mask]).sum()
    ess = t * t / ssum
    assert abs(row["ess"] - ess) < max(0.5, 1e-3 * ess)
    assert abs(row["ess_ratio"] - ess / n) < 1e-3
    wmax = (tb[mask] / nb[mask]).max() * n / t
    assert abs(row["max_weight"] - wmax) < 1e-3
    assert 0 < row["ess_ratio"] <= 1.0 + 1e-9
