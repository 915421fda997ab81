"""ext176: literal re-derivations -- assortativity vs a Counter-based
mixing matrix (plus the perfect-mixing law r = 1 when all edges are
within-group and the sign law for anti-mixing), Wagner-Whitin vs the
textbook O(T^2) DP loop (plus the optimality laws: WW <= lot-for-lot
and WW <= single-batch, and the zero-holding law: free holding makes
single-batch optimal), and F2D vs a Counter loop (plus the
aggregation law: summing the 90 cells by first digit recovers the
first-digit Benford probabilities)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext176 import (
    _K_MULT,
    _P_F2D,
    q_benford_first_two_digits,
    q_brand_assortativity_copurchase,
    q_wagner_whitin_lotsize,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_assortativity_matches_counter(spark, sf_dir):
    row = q_brand_assortativity_copurchase(spark, sf_dir).collect()[0]
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows = lineitem.join(
        part, lineitem.l_partkey == part.p_partkey
    ).collect()
    per_order = defaultdict(list)
    for r in rows:
        per_order[r["l_orderkey"]].append(r["p_brand"])
    edges = Counter()
    for brands in per_order.values():
        for i in range(len(brands)):
            for j in range(i + 1, len(brands)):
                a, b = sorted((brands[i], brands[j]))
                edges[(a, b)] += 1
    m = sum(edges.values())
    tr = sum(w for (a, b), w in edges.items() if a == b)
    deg = Counter()
    for (a, b), w in edges.items():
        deg[a] += w
        deg[b] += w
    sab = sum(
        math.floor((d / (2 * m)) ** 2 * 1e12 + 0.5) for d in deg.values()
    ) / 1e12
    obs = 2 * tr / (2 * m)
    r_exp = (obs - sab) / (1 - sab)
    assert row["n_edges"] == m
    assert row["same_brand_share"] == pytest.approx(obs, abs=1e-6)
    assert row["expected_share"] == pytest.approx(sab, abs=1e-6)
    assert row["assortativity_r"] == pytest.approx(r_exp, abs=1e-5)


def test_assortativity_sign_laws():
    def r_of(edges):
        m = sum(edges.values())
        tr = sum(w for (a, b), w in edges.items() if a == b)
        deg = Counter()
        for (a, b), w in edges.items():
            deg[a] += w
            deg[b] += w
        sab = sum((d / (2 * m)) ** 2 for d in deg.values())
        return (tr / m - sab) / (1 - sab)

    perfect = Counter({("x", "x"): 10, ("y", "y"): 10})
    assert r_of(perfect) == pytest.approx(1.0, abs=1e-12)
    anti = Counter({("x", "y"): 20})
    assert r_of(anti) < 0


def _ww_dp(dem, k_cost, h=1):
    n = len(dem)
    f = [0] + [None] * n
    for t in range(1, n + 1):
        best = None
        for j in range(1, t + 1):
            hold = sum((i - j) * dem[i - 1] for i in range(j, t + 1))
            cand = f[j - 1] + k_cost + h * hold
            best = cand if best is None or cand < best else best
        f[t] = best
    return f[n]


def test_ww_matches_dp_loop(spark, sf_dir):
    row = q_wagner_whitin_lotsize(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderdate")
        .collect()
    )
    per = Counter(str(r["o_orderdate"])[:7] for r in daily)
    dem = [per[m] for m in sorted(per)]
    tt = len(dem)
    mu = -(-sum(dem) // tt)
    k_cost = _K_MULT * mu
    opt = _ww_dp(dem, k_cost)
    assert row["n_months"] == tt
    assert row["mu_monthly_demand"] == mu
    assert row["setup_cost"] == k_cost
    assert row["optimal_cost"] == opt
    assert row["lot_for_lot_cost"] == tt * k_cost
    single = k_cost + sum((i - 1) * d for i, d in enumerate(dem, 1))
    assert row["single_batch_cost"] == single
    # optimality laws
    assert opt <= tt * k_cost
    assert opt <= single


def test_ww_zero_holding_law():
    dem = [5, 9, 2, 14, 7]
    k_cost = 100
    opt = _ww_dp(dem, k_cost, h=0)
    assert opt == k_cost  # free holding: one batch covers everything


def test_f2d_matches_counter(spark, sf_dir):
    row = q_benford_first_two_digits(spark, sf_dir).collect()[0]
    rows = read_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    cnt = Counter(int(str(round(r["o_totalprice"] * 100))[:2]) for r in rows)
    n = sum(cnt.values())
    chis = {
        d: math.floor(
            (cnt.get(d, 0) - n * p) ** 2 / (n * p) * 1e9 + 0.5
        )
        for d, p in zip(range(10, 100), _P_F2D)
    }
    chi2 = sum(chis.values()) / 1e9
    mad = sum(
        math.floor(abs(cnt.get(d, 0) / n - p) * 1e12 + 0.5)
        for d, p in zip(range(10, 100), _P_F2D)
    ) / 1e12 / 90
    worst = max(range(10, 100), key=lambda d: (chis[d], -d))
    assert row["n_values"] == n
    assert row["chi2"] == pytest.approx(chi2, abs=1e-3)
    assert row["mad"] == pytest.approx(mad, abs=1e-6)
    assert row["worst_cell"] == worst


def test_f2d_aggregates_to_first_digit_law():
    # summing P(d1 d2) over d2 recovers the first-digit law
    for d1 in range(1, 10):
        s = sum(
            p
            for d, p in zip(range(10, 100), _P_F2D)
            if d // 10 == d1
        )
        assert s == pytest.approx(math.log10(1 + 1 / d1), abs=1e-12)
    assert sum(_P_F2D) == pytest.approx(1.0, abs=1e-12)
