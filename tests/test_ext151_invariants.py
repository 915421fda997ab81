"""ext151: literal re-derivations -- a textbook Python Levenshtein DP
over the rebuilt path strings, the greedy knapsack from sorted lists
(plus the LP-bound dominance law), and the Shapley R^2 identity."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext151 import (
    _FUNNEL,
    q_dominance_analysis_2var,
    q_funnel_edit_distance,
    q_knapsack_budget_selection,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_funnel_edit_distance_matches_dp(spark, sf_dir):
    got = {
        r["edit_distance"]: r
        for r in q_funnel_edit_distance(spark, sf_dir).collect()
    }
    ev = (
        convert_event_ts(read_table(spark, sf_dir, "events"))
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r["user_id"]].append(
            (int(r["ts"].timestamp() * 1e6), r["event_id"], r["event_type"][0])
        )
    hist = defaultdict(lambda: [0, 0])
    for u, lst in per.items():
        lst.sort()
        s = "".join(c for _, _, c in lst)[:20]
        d = _lev(s, _FUNNEL)
        hist[d][0] += 1
        hist[d][1] += len(s)
    assert set(got) == set(hist)
    for d, (n, tl) in hist.items():
        assert got[d]["n_users"] == n
        assert got[d]["avg_path_len"] == pytest.approx(tl / n, abs=1e-5)


def test_knapsack_matches_sorted_greedy(spark, sf_dir):
    row = q_knapsack_budget_selection(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount", "l_quantity"
    ).collect()
    val, wt = defaultdict(int), defaultdict(int)
    for r in li:
        # SQL round() is half-AWAY-from-zero; python round() is
        # half-to-even -- mirror the engines' rule on positive cents
        val[r["l_partkey"]] += math.floor(
            r["l_extendedprice"] * (1 - r["l_discount"]) * 100 + 0.5
        )
        wt[r["l_partkey"]] += int(r["l_quantity"])
    budget = sum(wt.values()) // 10
    items = sorted(
        val, key=lambda p: (-(val[p] * 1_000_000 // wt[p]), p)
    )
    w = v = nfull = 0
    lp = None
    for p in items:
        if w + wt[p] <= budget:
            w += wt[p]
            v += val[p]
            nfull += 1
        else:
            lp = v + (budget - w) * (val[p] * 1_000_000 // wt[p]) / 1_000_000
            break
    if lp is None:
        lp = float(v)
    assert row["weight_budget"] == budget
    assert row["n_items_full"] == nfull
    assert row["greedy_value_dollars"] == pytest.approx(v / 100, abs=0.01)
    assert row["lp_bound_dollars"] == pytest.approx(lp / 100, abs=0.01)
    # the LP relaxation dominates the integral greedy take
    assert row["lp_bound_dollars"] >= row["greedy_value_dollars"] - 1e-9


def test_dominance_matches_literal_and_identity(spark, sf_dir):
    row = q_dominance_analysis_2var(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            {"*": "count", "o_custkey": "approx_count_distinct"}
        )
    )
    # recompute exactly with collect-side loops instead
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_custkey", "o_totalprice"
    ).collect()
    agg = defaultdict(lambda: [0, set(), 0])
    for r in orders:
        a = agg[r["o_orderdate"]]
        a[0] += 1
        a[1].add(r["o_custkey"])
        a[2] += round(r["o_totalprice"] * 100)
    x1 = [a[0] for a in agg.values()]
    x2 = [len(a[1]) for a in agg.values()]
    y = [a[2] // 100 for a in agg.values()]
    n = len(x1)

    def corr(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(p * q for p, q in zip(a, b))
        saa = sum(p * p for p in a)
        sbb = sum(q * q for q in b)
        return (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )

    r1, r2, r12 = corr(x1, y), corr(x2, y), corr(x1, x2)
    full = (r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12) / (1 - r12 * r12)
    sh1 = (r1 * r1 + (full - r2 * r2)) / 2
    sh2 = (r2 * r2 + (full - r1 * r1)) / 2
    assert row["r2_count_only"] == pytest.approx(r1 * r1, abs=1e-5)
    assert row["r2_customers_only"] == pytest.approx(r2 * r2, abs=1e-5)
    assert row["r2_full"] == pytest.approx(full, abs=1e-5)
    assert row["shapley_count"] == pytest.approx(sh1, abs=1e-5)
    assert row["shapley_customers"] == pytest.approx(sh2, abs=1e-5)
    # the decomposition identity: shares sum to the full R^2
    assert row["shapley_count"] + row["shapley_customers"] == pytest.approx(
        row["r2_full"], abs=2e-6
    )
    assert 0 <= row["r2_full"] <= 1
