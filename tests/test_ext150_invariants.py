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


def test_bt_fold_matches_engine_rounds(spark, sf_dir):
    """r9 reclassification proof: the driver fold's three MM rounds
    must equal the ENGINE-side evaluation (the pre-r9 formulation:
    per-pair e12 quantization summed in an aggregate, doubles between
    rounds) bit-for-bit -- the r8 COVERAGE note claimed order
    sensitivity; this pins the counter-claim that all cross-term sums
    are integer sums and hence order-free."""
    from pyspark.sql import functions as F

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    mrev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    a, b = mrev.alias("a"), mrev.alias("b")
    games = (
        a.join(
            b,
            (F.col("a.m") == F.col("b.m"))
            & (F.col("a.nation") != F.col("b.nation"))
            & (F.col("a.rev") != F.col("b.rev")),
        )
        .groupBy(F.col("a.nation").alias("i"), F.col("b.nation").alias("j"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_games"),
            F.sum(F.when(F.col("a.rev") > F.col("b.rev"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_wins"),
        )
        .localCheckpoint(eager=True)
    )
    wins = (
        games.groupBy(F.col("i").alias("nation"))
        .agg(F.sum("n_wins").cast("bigint").alias("wins"))
        .localCheckpoint(eager=True)
    )
    pi = wins.select("nation", F.lit(1.0).alias("pi")).localCheckpoint(
        eager=True
    )
    for _ in range(_BT_ROUNDS):
        pa = pi.select(F.col("nation").alias("i"), F.col("pi").alias("pi_i"))
        pb = pi.select(F.col("nation").alias("j"), F.col("pi").alias("pi_j"))
        den = (
            games.join(F.broadcast(pa), "i")
            .join(F.broadcast(pb), "j")
            .select(
                "i",
                F.floor(
                    F.col("n_games").cast("double")
                    / (F.col("pi_i") + F.col("pi_j"))
                    * 1e12
                    + 0.5
                )
                .cast("bigint")
                .alias("t_e12"),
            )
            .groupBy("i")
            .agg(F.sum("t_e12").cast("decimal(38,0)").alias("den_e12"))
        )
        upd = wins.join(den, wins.nation == den.i).select(
            "nation",
            (
                F.col("wins").cast("double")
                / (F.col("den_e12").cast("double") / 1e12)
            ).alias("pi_raw"),
        )
        tot = upd.agg(
            F.sum(F.floor(F.col("pi_raw") * 1e9 + 0.5).cast("bigint"))
            .cast("decimal(38,0)")
            .alias("tot_e9")
        )
        pi = (
            upd.crossJoin(F.broadcast(tot))
            .select(
                "nation",
                (
                    F.col("pi_raw")
                    * 25.0
                    / (F.col("tot_e9").cast("double") / 1e9)
                ).alias("pi"),
            )
            .localCheckpoint(eager=True)
        )
    engine = {
        r["nation"]: (r["wins"], r["bt_strength"])
        for r in pi.join(wins, "nation")
        .select(
            "nation", "wins", F.round(F.col("pi"), 6).alias("bt_strength")
        )
        .collect()
    }
    fold = {
        r["nation"]: r
        for r in q_bradley_terry_nations(spark, sf_dir).collect()
    }
    assert set(engine) == set(fold)
    for n, (w, p_engine) in engine.items():
        assert fold[n]["total_wins"] == w
        # BIT-FOR-BIT: engine-side round(6) of the engine rounds equals
        # the fold's HALF-UP-on-shortest-repr mirror exactly
        assert fold[n]["bt_strength"] == p_engine
