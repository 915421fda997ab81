"""Definition-level checks for the ext65 batch."""

from __future__ import annotations

import math

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext65 import (
    _KM_ITERS,
    _KM_K,
    q_boxplot_five_number,
    q_cmh_pooled_odds,
    q_kmeans_1d_lloyd,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_cmh_matches_literal_strata(spark, sf_dir):
    row = q_cmh_pooled_odds(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_discount", "l_returnflag"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").toPandas()
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    df = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    df["e"] = (df.l_discount >= 0.05).astype(int)
    df["y"] = (df.l_returnflag == "R").astype(int)
    num = den = sum_a = e_sum = v_sum = 0
    n_strata = 0
    for _, g in df.groupby("c_nationkey"):
        a = int(((g.e == 1) & (g.y == 1)).sum())
        b = int(((g.e == 1) & (g.y == 0)).sum())
        cc = int(((g.e == 0) & (g.y == 1)).sum())
        d = int(((g.e == 0) & (g.y == 0)).sum())
        n = a + b + cc + d
        if n <= 1:
            continue
        n_strata += 1
        num += int(math.floor(1e9 * a * d / n + 0.5))
        den += int(math.floor(1e9 * b * cc / n + 0.5))
        sum_a += a
        e_sum += int(math.floor(1e9 * (a + b) * (a + cc) / n + 0.5))
        v_sum += int(
            math.floor(
                1e9 * ((a + b) * (cc + d) * (a + cc) * (b + d)) / (n * n * (n - 1))
                + 0.5
            )
        )
    assert row["n_strata"] == n_strata
    assert abs(row["cmh_odds_ratio"] - num / den) < 1e-6
    chi2 = (abs(sum_a - e_sum / 1e9) - 0.5) ** 2 / (v_sum / 1e9)
    assert abs(row["cmh_chi2_cc"] - chi2) < 1e-5


def test_boxplot_matches_literal_order_stats(spark, sf_dir):
    got = {r["priority"]: r for r in q_boxplot_five_number(spark, sf_dir).collect()}
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    o["v"] = np.floor(o.o_totalprice * 100 + 0.5).astype("int64")
    for grp, g in o.groupby("o_orderpriority"):
        v = np.sort(g.v.to_numpy())
        n = len(v)

        def first_reaching(mult_num, mult_den):
            # min value whose cumulative count cc satisfies
            # mult_den * cc >= mult_num * n
            cc = np.arange(1, n + 1)
            idx = np.argmax(mult_den * cc >= mult_num * n)
            return int(v[idx])

        q1 = first_reaching(1, 4)
        med = first_reaching(1, 2)
        q3 = first_reaching(3, 4)
        lo_f = q1 - 3 * (q3 - q1) // 2
        hi_f = q3 + 3 * (q3 - q1) // 2
        r = got[grp]
        assert (r["n"], r["min_cents"], r["max_cents"]) == (n, int(v[0]), int(v[-1]))
        assert (r["q1"], r["med"], r["q3"]) == (q1, med, q3)
        assert (r["lo_fence"], r["hi_fence"]) == (lo_f, hi_f)
        assert r["n_outliers"] == int(((v < lo_f) | (v > hi_f)).sum())
        assert v[0] <= q1 <= med <= q3 <= v[-1]


def test_kmeans_matches_literal_lloyd(spark, sf_dir):
    got = {r["cluster"]: r for r in q_kmeans_1d_lloyd(spark, sf_dir).collect()}
    o = read_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()
    v = np.sort(np.floor(o.o_totalprice * 100 + 0.5).astype("int64"))
    n = len(v)
    cc = np.arange(1, n + 1)
    centers = [
        int(v[np.argmax(8 * cc >= m * n)]) for m in (1, 3, 5, 7)
    ]

    def assign(x, cs):
        dists = [abs(int(x) - c) for c in cs]
        return int(np.argmin(dists))  # ties -> lowest index, like the CASE

    for _ in range(_KM_ITERS):
        sums = [0] * _KM_K
        cnts = [0] * _KM_K
        for x in v:
            i = assign(x, centers)
            sums[i] += int(x)
            cnts[i] += 1
        centers = [
            sums[i] // cnts[i] if cnts[i] else centers[i] for i in range(_KM_K)
        ]
    stats = {i: [0, 0] for i in range(_KM_K)}
    for x in v:
        i = assign(x, centers)
        stats[i][0] += 1
        stats[i][1] += abs(int(x) - centers[i])
    for i in range(_KM_K):
        if stats[i][0] == 0:
            assert i not in got
            continue
        r = got[i]
        assert r["center_cents"] == centers[i]
        assert r["n_points"] == stats[i][0]
        assert r["mean_abs_dev_cents"] == stats[i][1] // stats[i][0]
    # Lloyd invariant: centers are ordered and clusters partition the data
    assert centers == sorted(centers)
    assert sum(s[0] for s in stats.values()) == n
