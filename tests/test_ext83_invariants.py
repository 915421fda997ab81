"""Definition-level checks for ext83: literal numpy re-derivations of
Brown-Forsythe, Bartlett, and a brute-force pairwise JT on ranks."""

from __future__ import annotations

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext83 import (
    q_bartlett_test,
    q_brown_forsythe,
    q_jonckheere_terpstra,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _prices(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).toPandas()
    cents = np.floor(li.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64")
    return li.l_returnflag.to_numpy(), cents // 100


def test_brown_forsythe_definition(spark, sf_dir):
    row = q_brown_forsythe(spark, sf_dir).collect()[0]
    g, v = _prices(spark, sf_dir)
    groups = sorted(set(g))
    n = len(v)
    assert row["n_total"] == n
    assert row["k_groups"] == len(groups)
    assert row["dof1"] == len(groups) - 1
    assert row["dof2"] == n - len(groups)
    zs = np.empty(n, dtype="int64")
    for gr in groups:
        m = g == gr
        s = np.sort(v[m])
        cc = np.arange(1, len(s) + 1)
        med = int(s[np.argmax(2 * cc >= len(s))])  # lower median
        zs[m] = np.abs(v[m] - med)
    zbar = zs.mean()
    between = sum(
        (g == gr).sum() * (zs[g == gr].mean() - zbar) ** 2 for gr in groups
    )
    within = sum(
        ((zs[g == gr] - zs[g == gr].mean()) ** 2).sum() for gr in groups
    )
    f = (between / (len(groups) - 1)) / (within / (n - len(groups)))
    assert abs(row["bf_stat"] - f) < 1e-4
    assert row["bf_stat"] >= 0.0


def test_bartlett_definition(spark, sf_dir):
    row = q_bartlett_test(spark, sf_dir).collect()[0]
    g, v = _prices(spark, sf_dir)
    groups = sorted(set(g))
    n, k = len(v), len(groups)
    assert row["n_total"] == n and row["k_groups"] == k and row["dof"] == k - 1
    s2s, ns = [], []
    for gr in groups:
        x = v[g == gr].astype("float64")
        s2s.append(x.var(ddof=1))
        ns.append(len(x))
    sp2 = sum((ni - 1) * s2 for ni, s2 in zip(ns, s2s)) / (n - k)
    num = (n - k) * np.log(sp2) - sum(
        (ni - 1) * np.log(s2) for ni, s2 in zip(ns, s2s)
    )
    c = 1 + (sum(1 / (ni - 1) for ni in ns) - 1 / (n - k)) / (3 * (k - 1))
    assert abs(row["bartlett_stat"] - num / c) < max(0.01, 1e-4 * abs(num / c))
    assert row["bartlett_stat"] >= 0.0


def test_jonckheere_definition(spark, sf_dir):
    row = q_jonckheere_terpstra(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    g = o.o_orderpriority.str[0].astype(int).to_numpy()
    v = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    n = len(v)
    assert row["n_total"] == n
    by = {k: np.sort(v[g == k]) for k in range(1, 6)}
    jt2 = 0
    for a in range(1, 6):
        for b in range(a + 1, 6):
            x, y = by[a], by[b]
            gt = np.searchsorted(x, y, side="left").sum()   # pairs y > x
            ge = np.searchsorted(x, y, side="right").sum()  # pairs y >= x
            jt2 += 2 * int(gt) + int(ge - gt)  # doubled, ties half
    assert row["jt_x2"] == jt2
    ns = np.array([len(by[k]) for k in range(1, 6)], dtype="object")
    _, tc = np.unique(v, return_counts=True)
    tc = tc.astype("object")
    e = (n * n - int((ns * ns).sum())) / 4
    v1 = (
        n * (n - 1) * (2 * n + 5)
        - int((ns * (ns - 1) * (2 * ns + 5)).sum())
        - int((tc * (tc - 1) * (2 * tc + 5)).sum())
    ) / 72
    v2 = (
        int((ns * (ns - 1) * (ns - 2)).sum())
        * int((tc * (tc - 1) * (tc - 2)).sum())
        / (36 * n * (n - 1) * (n - 2))
    )
    v3 = int((ns * (ns - 1)).sum()) * int((tc * (tc - 1)).sum()) / (8 * n * (n - 1))
    z = (jt2 / 2 - e) / np.sqrt(v1 + v2 + v3)
    assert abs(row["z_score"] - z) < 1e-4
