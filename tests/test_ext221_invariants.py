"""Invariants for ext221: Elo python re-derivation + near-zero-sum
law, bow-tie partition laws re-proven from a recomputed closure,
EMSR-b against stdlib NormalDist, and Loevinger H exact mirrors."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_Q = {q.name: q.fn for q in registry()}
_INIT = 1500 * 10**9


def _monthly_games(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    mrev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
        .collect()
    )
    by_m = defaultdict(dict)
    for r in mrev:
        by_m[r["m"]][r["nation"]] = r["rev"]
    return by_m


def test_elo_matches_python_and_near_zero_sum(spark, sf_dir):
    by_m = _monthly_games(spark, sf_dir)
    r = [_INIT] * 25
    n_games = 0
    for m in sorted(by_m):
        revs = by_m[m]
        deltas = [0] * 25
        for i, ri in revs.items():
            for j, rj in revs.items():
                if i != j and ri != rj:
                    s = 1 if ri > rj else 0
                    e = 1.0 / (
                        1.0 + math.pow(10.0, float(r[j] - r[i]) / 4.0e11)
                    )
                    deltas[i] += int(
                        math.floor(32.0 * 1.0e9 * (float(s) - e) + 0.5)
                    )
                    n_games += 1
        r = [r[n] + deltas[n] for n in range(25)]
    got = {
        row["nation"]: (row["rating_milli"], row["rank"])
        for row in _Q["elo_ratings_nations"](spark, sf_dir).collect()
    }
    order = sorted(range(25), key=lambda n: (-r[n], n))
    for rank, n in enumerate(order, start=1):
        assert got[n] == (r[n] // 10**6, rank)
    # near-zero-sum: each oriented game pair's rounded deltas cancel to
    # within 1 unit, so total drift is bounded by the game count
    assert abs(sum(r) - 25 * _INIT) <= n_games


def test_bowtie_partition_laws(spark, sf_dir):
    rows = _Q["bowtie_decomposition"](spark, sf_dir).collect()
    comp = {r["nation"]: r["component"] for r in rows}
    sizes = defaultdict(int)
    for r in rows:
        sizes[r["component"]] += 1
    for r in rows:
        assert r["component_size"] == sizes[r["component"]]
    # recompute the closure independently
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    flow = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy("c_nationkey", "s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    top = sorted(
        flow, key=lambda r: (-r["n"], r["c_nationkey"], r["s_nationkey"])
    )[:40]
    edges = {(r["c_nationkey"], r["s_nationkey"]) for r in top}
    nodes = sorted({x for e in edges for x in e})
    assert set(comp) == set(nodes)
    reach = {v: {v} for v in nodes}
    changed = True
    while changed:
        changed = False
        for i, j in edges:
            new = reach[j] - reach[i]
            if new:
                reach[i] |= new
                changed = True
    core = {v for v in nodes if comp[v] == "CORE"}
    assert core
    for u in core:
        for v in core:
            assert v in reach[u], "CORE must be mutually reachable"
    for v, c in comp.items():
        reaches_core = any(w in reach[v] for w in core) and v not in core
        reached_by = any(v in reach[w] for w in core) and v not in core
        if c == "IN":
            assert reaches_core
        elif c == "OUT":
            assert reached_by and not reaches_core
        elif c == "OTHER":
            assert not reaches_core and not reached_by


def test_emsr_b_against_normaldist(spark, sf_dir):
    from statistics import NormalDist

    rows = sorted(
        _Q["emsr_b_protection"](spark, sf_dir).collect(),
        key=lambda r: r["class_rank"],
    )
    assert [r["class_rank"] for r in rows] == [1, 2, 3, 4]
    fares = [r["fare_cents"] for r in rows]
    assert fares == sorted(fares, reverse=True)
    # independent sigma: per-class daily count variance from collected
    # moments, accumulated over the fare-ranked prefix
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderdate")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    d_all = len({r["o_orderdate"] for r in daily})
    mom = defaultdict(lambda: [0, 0])
    for r in daily:
        mom[r["o_orderpriority"]][0] += r["c"]
        mom[r["o_orderpriority"]][1] += r["c"] * r["c"]
    var = {
        p: (d_all * sc2 - sc * sc) / (d_all * d_all)
        for p, (sc, sc2) in mom.items()
    }
    prev_mu = 0.0
    cum_var = 0.0
    seen = []
    for r in rows:
        assert 0.0 < r["critical_p"] < 1.0
        assert r["agg_mean_daily"] > prev_mu  # cumulative means grow
        prev_mu = r["agg_mean_daily"]
        seen.append(r["priority"])
        cum_var += var[r["priority"]]
        z = NormalDist().inv_cdf(r["critical_p"])
        # Acklam (query) vs stdlib inv_cdf (independent algorithm)
        # agree through the full protection formula
        assert r["protection_level"] == pytest.approx(
            r["agg_mean_daily"] + z * math.sqrt(cum_var), abs=1e-4
        )


def test_mokken_h_matches_python(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).distinct().collect()
    users = defaultdict(set)
    pop = defaultdict(int)
    for r in ev:
        users[r["user_id"]].add(r["event_type"])
        pop[r["event_type"]] += 1
    n = len(users)
    got = {
        (r["hard_item"], r["easy_item"]): r
        for r in _Q["mokken_loevinger_h"](spark, sf_dir).collect()
    }
    items = sorted(pop)
    n_pairs = 0
    for hard in items:
        for easy in items:
            if hard == easy:
                continue
            if not (
                pop[hard] < pop[easy]
                or (pop[hard] == pop[easy] and hard < easy)
            ):
                continue
            n_pairs += 1
            f = sum(
                1
                for u, s in users.items()
                if hard in s and easy not in s
            )
            row = got[(hard, easy)]
            assert row["f_obs"] == f
            assert row["t_hard"] == pop[hard]
            assert row["t_easy"] == pop[easy]
            expected = pop[hard] * (n - pop[easy]) / n
            assert row["f_expected"] == pytest.approx(expected, abs=1e-4)
            if expected > 0:
                assert row["h_ij"] == pytest.approx(
                    1 - f / expected, abs=1e-4
                )
    assert len(got) == n_pairs
