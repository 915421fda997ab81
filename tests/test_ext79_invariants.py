"""Definition-level checks for ext79: brute-force pairwise distances
(energy distance, CRPS) at test scale, literal Good-Turing counts, and
an np-based exact KS."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext79 import (
    _TEST_DAYS,
    q_crps_ensemble,
    q_energy_distance,
    q_good_turing_counts,
    q_ks_two_sample_acctbal,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_energy_distance_definition(spark, sf_dir):
    row = q_energy_distance(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).toPandas()
    sel = li[li.l_returnflag.isin(["R", "A"])]
    v = np.floor(sel.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64")
    r = (sel.l_returnflag == "R").to_numpy()
    x, y = np.sort(v[r]), np.sort(v[~r])
    n1, n0 = len(x), len(y)
    assert row["n_r"] == n1 and row["n_a"] == n0

    def mean_abs_within(s):
        # E|X-X'| via the sorted identity sum (2i - n - 1) x_(i) (V-stat)
        n = len(s)
        i = np.arange(1, n + 1, dtype="float64")
        return 2.0 * ((2 * i - n - 1) * s).sum() / (n * n)

    def mean_abs_cross(a, b):
        # merge-based exact sum of |a_i - b_j| using prefix sums
        tot = 0
        pre = np.concatenate(([0], np.cumsum(b, dtype="object")))
        idx = np.searchsorted(b, a, side="left")
        for ai, k in zip(a.astype(object), idx):
            below = ai * k - pre[k]
            above = (pre[len(b)] - pre[k]) - ai * (len(b) - k)
            tot += below + above
        return float(tot) / (len(a) * len(b))

    a = mean_abs_cross(x, y)
    b = mean_abs_within(x)
    c = mean_abs_within(y)
    d2 = 2 * a - b - c
    assert abs(row["mean_abs_gap_dollars"] - a / 100) < 1e-2
    assert abs(row["energy_dist_dollars"] - d2 / 100) < 1e-2
    assert abs(row["e_coefficient"] - d2 / (2 * a)) < 1e-5
    # energy distance is nonnegative and below the cross term
    assert -1e-9 <= row["e_coefficient"] <= 1.0


def test_crps_definition(spark, sf_dir):
    row = q_crps_ensemble(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    d = (
        pd.DataFrame({"dt": pd.to_datetime(o.o_orderdate), "y": cents})
        .groupby("dt", as_index=False)["y"]
        .sum()
        .sort_values("dt")
    )
    cutoff = d.dt.max() - pd.Timedelta(days=_TEST_DAYS)
    d["dow"] = d.dt.dt.dayofweek
    train, test = d[d.dt <= cutoff], d[d.dt > cutoff]
    crps_vals = []
    for _, r in test.iterrows():
        xs = train[train.dow == r.dow].y.to_numpy().astype("float64")
        m = len(xs)
        term1 = np.abs(xs - r.y).mean()
        term2 = np.abs(xs[:, None] - xs[None, :]).sum() / (2 * m * m)
        crps_vals.append(term1 - term2)
    assert row["n_test_days"] == len(test)
    assert abs(row["avg_crps_dollars"] - np.mean(crps_vals) / 100) < 1e-2
    # CRPS of an ensemble is nonnegative
    assert row["avg_crps_dollars"] >= 0.0


def test_good_turing_definition(spark, sf_dir):
    rows = q_good_turing_counts(spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents").select("text").toPandas()
    cnt = Counter()
    for t in docs.text:
        w = t.split(" ")
        for i in range(len(w) - 2):
            cnt[" ".join(w[i : i + 3])] += 1
    fof = Counter(cnt.values())
    n_tokens = sum(r * n for r, n in fof.items())
    assert len(rows) > 0
    for r in rows:
        rr = r["r"]
        assert r["n_types_at_r"] == fof[rr]
        expect = (rr + 1) * fof[rr + 1] / fof[rr]
        assert abs(r["r_star"] - expect) < 1e-5
        assert abs(r["discount_ratio"] - expect / rr) < 1e-5
        assert abs(r["p0_unseen_mass"] - fof[1] / n_tokens) < 1e-6
    # every r in 1..max with a successor bucket must appear
    present = {r["r"] for r in rows}
    for rr in sorted(fof):
        if rr <= 10 and (rr + 1) in fof:
            assert rr in present


def test_ks_definition(spark, sf_dir):
    row = q_ks_two_sample_acctbal(spark, sf_dir).collect()[0]
    cu = read_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal"
    ).toPandas()
    sel = cu[cu.c_mktsegment.isin(["BUILDING", "MACHINERY"])]
    v = np.floor(sel.c_acctbal.to_numpy() * 100 + 0.5).astype("int64")
    b = (sel.c_mktsegment == "BUILDING").to_numpy()
    x, y = np.sort(v[b]), np.sort(v[~b])
    n1, n0 = len(x), len(y)
    assert row["n_building"] == n1 and row["n_machinery"] == n0
    spine = np.unique(v)
    cdf1 = np.searchsorted(x, spine, side="right") / n1
    cdf0 = np.searchsorted(y, spine, side="right") / n0
    gaps = np.abs(cdf1 - cdf0)
    ks = gaps.max()
    assert abs(row["ks_stat"] - ks) < 1e-6
    assert abs(row["scaled_ks"] - np.sqrt(n1 * n0 / (n1 + n0)) * ks) < 1e-4
    # argmax value matches (first spine value attaining the max gap,
    # by the exact integer comparison)
    num = np.abs(
        np.searchsorted(x, spine, side="right") * n0
        - np.searchsorted(y, spine, side="right") * n1
    )
    at = spine[np.lexsort((spine, -num))[0]]
    assert row["ks_at_dollars"] == round(int(at) / 100, 2)
