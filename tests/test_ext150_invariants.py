"""ext150: literal re-derivations of the social-choice batch --
Borda/Copeland/Condorcet from dict rankings, Kendall distances from
pair loops, Bradley-Terry from a plain fixed-point loop, plus a
constructed Condorcet-paradox fixture proving the cycle detection."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext150 import (
    _BT_ROUNDS,
    q_borda_copeland_nations,
    q_bradley_terry_nations,
    q_kendall_distance_rankings,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def metrics(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    ).collect()
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in read_table(spark, sf_dir, "customer").collect()
    }
    rev, cnt, custs = defaultdict(int), defaultdict(int), defaultdict(set)
    monthly = defaultdict(int)
    for r in orders:
        nat = cust[r["o_custkey"]]
        rev[nat] += round(r["o_totalprice"] * 100)
        cnt[nat] += 1
        custs[nat].add(r["o_custkey"])
        monthly[(nat, (r["o_orderdate"].year, r["o_orderdate"].month))] += round(
            r["o_totalprice"] * 100
        )
    nations = sorted(rev)

    def ranks(metric):
        order = sorted(nations, key=lambda n: (-metric[n], n))
        return {n: i + 1 for i, n in enumerate(order)}

    return (
        nations,
        ranks(rev),
        ranks(cnt),
        ranks({n: len(custs[n]) for n in nations}),
        monthly,
    )


def test_borda_copeland_match_literal(spark, sf_dir, metrics):
    nations, r_rev, r_ord, r_cust, _ = metrics
    got = {r["nation"]: r for r in q_borda_copeland_nations(spark, sf_dir).collect()}
    assert set(got) == set(nations)
    for n in nations:
        borda = (26 - r_rev[n]) + (26 - r_ord[n]) + (26 - r_cust[n])
        wins = sum(
            1
            for m in nations
            if m != n
            and (
                (r_rev[n] < r_rev[m])
                + (r_ord[n] < r_ord[m])
                + (r_cust[n] < r_cust[m])
            )
            >= 2
        )
        assert got[n]["borda_score"] == borda
        assert got[n]["copeland_wins"] == wins
        assert got[n]["is_condorcet_winner"] == (wins == 24)
    # at most one Condorcet winner
    assert sum(1 for r in got.values() if r["is_condorcet_winner"]) <= 1


def test_condorcet_paradox_fixture():
    # 3 voters, 3 candidates in a rock-paper-scissors cycle: nobody
    # wins all pairwise majorities -- the structure the query's
    # is_condorcet_winner flag encodes
    prefs = [("a", "b", "c"), ("b", "c", "a"), ("c", "a", "b")]

    def beats(x, y):
        return sum(1 for p in prefs if p.index(x) < p.index(y)) >= 2

    cands = "abc"
    copeland = {
        x: sum(1 for y in cands if y != x and beats(x, y)) for x in cands
    }
    assert all(w < 2 for w in copeland.values())


def test_kendall_distances_match_literal(spark, sf_dir, metrics):
    nations, r_rev, r_ord, r_cust, _ = metrics
    row = q_kendall_distance_rankings(spark, sf_dir).collect()[0]

    def kd(ra, rb):
        return sum(
            1
            for i, x in enumerate(nations)
            for y in nations[i + 1 :]
            if (ra[x] - ra[y]) * (rb[x] - rb[y]) < 0
        )

    npairs = len(nations) * (len(nations) - 1) // 2
    for cols, (ra, rb) in {
        ("kd_revenue_vs_orders", "tau_revenue_vs_orders"): (r_rev, r_ord),
        ("kd_revenue_vs_customers", "tau_revenue_vs_customers"): (r_rev, r_cust),
        ("kd_orders_vs_customers", "tau_orders_vs_customers"): (r_ord, r_cust),
    }.items():
        k = kd(ra, rb)
        assert row[cols[0]] == k
        assert row[cols[1]] == pytest.approx(1 - 2 * k / npairs, abs=1e-6)
    assert row["n_pairs"] == npairs


def test_bradley_terry_matches_fixed_point(spark, sf_dir, metrics):
    nations, _, _, _, monthly = metrics
    got = {r["nation"]: r for r in q_bradley_terry_nations(spark, sf_dir).collect()}
    months = sorted({m for _, m in monthly})
    games = defaultdict(int)
    wins_ij = defaultdict(int)
    for m in months:
        present = [(n, monthly[(n, m)]) for n in nations if (n, m) in monthly]
        for i, ri in present:
            for j, rj in present:
                if i != j and ri != rj:
                    games[(i, j)] += 1
                    if ri > rj:
                        wins_ij[(i, j)] += 1
    wins = {n: sum(w for (i, _), w in wins_ij.items() if i == n) for n in nations}
    active = sorted({i for i, _ in games})
    pi = {n: 1.0 for n in active}
    for _ in range(_BT_ROUNDS):
        den = {
            n: sum(
                games[(n, m)] / (pi[n] + pi[m])
                for m in active
                if (n, m) in games
            )
            for n in active
        }
        raw = {n: wins[n] / den[n] for n in active}
        tot = sum(raw.values())
        pi = {n: raw[n] * 25.0 / tot for n in active}
    for n in active:
        assert got[n]["total_wins"] == wins[n]
        assert got[n]["bt_strength"] == pytest.approx(pi[n], abs=1e-4)
    # strengths are positive and ordered consistently with themselves
    assert all(r["bt_strength"] > 0 for r in got.values())


def test_bt_recovers_a_planted_hierarchy():
    # pure fixed-point sanity: a >> b >> c in wins must order strengths
    games = {("a", "b"): 10, ("b", "a"): 10, ("b", "c"): 10, ("c", "b"): 10,
             ("a", "c"): 10, ("c", "a"): 10}
    w = {("a", "b"): 9, ("b", "a"): 1, ("b", "c"): 9, ("c", "b"): 1,
         ("a", "c"): 10, ("c", "a"): 0}
    wins = {n: sum(v for (i, _), v in w.items() if i == n) for n in "abc"}
    pi = {n: 1.0 for n in "abc"}
    for _ in range(30):
        den = {
            n: sum(games[(n, m)] / (pi[n] + pi[m]) for m in "abc" if m != n)
            for n in "abc"
        }
        raw = {n: max(wins[n], 1e-9) / den[n] for n in "abc"}
        tot = sum(raw.values())
        pi = {n: raw[n] * 3 / tot for n in "abc"}
    assert pi["a"] > pi["b"] > pi["c"]
