"""Definition-level re-derivations for the ext21 batch (grid-DBSCAN,
entity resolution, MERGE, mergeable HLL, k-core): each distributed
formulation is checked against the LITERAL definition in plain Python
at test scale."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext21 import (
    _KCORE_K,
    _KCORE_ROUNDS,
    _MIN_PTS,
    q_approx_distinct_union,
    q_dbscan_grid_clusters,
    q_entity_resolution_golden,
    q_kcore_membership,
    q_merge_upsert_apply,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.element_at("embedding", 1).cast("double").alias("x"),
            F.element_at("embedding", 2).cast("double").alias("y"),
        )
        .collect()
    )
    return [(r["vec_id"], r["x"], r["y"]) for r in rows]


def test_dbscan_matches_python_bfs(spark, sf_dir, points):
    cells = defaultdict(int)
    for _, x, y in points:
        cells[(math.floor(x / 0.03), math.floor(y / 0.03))] += 1
    dense = {c: n for c, n in cells.items() if n >= _MIN_PTS}
    # BFS over 8-adjacency of dense cells
    seen, clusters = set(), []
    for c in dense:
        if c in seen:
            continue
        comp, stack = [], [c]
        seen.add(c)
        while stack:
            cur = stack.pop()
            comp.append(cur)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cur[0] + dx, cur[1] + dy)
                    if nb in dense and nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
        clusters.append(comp)
    key = lambda cell: (cell[0] + 1000) * 100000 + (cell[1] + 1000)
    want = {
        min(key(c) for c in comp): (
            len(comp),
            sum(dense[c] for c in comp),
            min(c[0] for c in comp),
            min(c[1] for c in comp),
        )
        for comp in clusters
    }
    got = {
        r["cluster"]: (r["n_cells"], r["n_points"], r["min_cx"], r["min_cy"])
        for r in q_dbscan_grid_clusters(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 1, "parameters must produce multi-cluster structure"


def test_er_golden_records_recover_originals(spark, sf_dir):
    cust = {
        r["c_custkey"]: (r["c_name"], round(r["c_acctbal"], 2))
        for r in read_table(spark, sf_dir, "customer").collect()
    }
    rows = q_entity_resolution_golden(spark, sf_dir).collect()
    assert len(rows) == len(cust), "one cluster per original customer"
    for r in rows:
        assert r["n_records"] == 3, "original + 2 dirty twins"
        name, bal = cust[r["cluster"]]
        assert r["golden_name"] == name
        assert math.isclose(r["golden_bal"], bal, abs_tol=1e-9)


def test_merge_actions_match_python(spark, sf_dir):
    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value", F.unix_micros("ts").alias("us"))
        .collect()
    )
    latest = {}
    for r in ev:
        k = r["user_id"]
        cand = (r["us"], r["event_id"], round(r["value"], 2))
        if k not in latest or cand[:2] > latest[k][:2]:
            latest[k] = cand
    dim = {
        r["c_custkey"]: round(r["c_acctbal"], 2)
        for r in read_table(spark, sf_dir, "customer").collect()
        if r["c_custkey"] % 2 == 0
    }
    got = {r["k"]: r for r in q_merge_upsert_apply(spark, sf_dir).collect()}
    assert set(got) == set(latest), "one MERGE decision per source key"
    for k, (_, _, val) in latest.items():
        r = got[k]
        if k not in dim:
            assert r["action"] == "INSERT" and r["old_bal"] is None
            assert math.isclose(r["new_bal"], val, abs_tol=1e-9)
        elif val < 50:
            assert r["action"] == "DELETE" and r["new_bal"] is None
            assert math.isclose(r["old_bal"], dim[k], abs_tol=1e-9)
        else:
            assert r["action"] == "UPDATE"
            assert math.isclose(r["new_bal"], val, abs_tol=1e-9)


def test_hll_union_equals_single_sketch(spark, sf_dir):
    """The mergeability contract: union of per-partition sketches must
    estimate the same as one sketch over the whole partition."""
    orders = read_table(spark, sf_dir, "orders")
    merged = (
        orders.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.expr("hll_sketch_agg(o_custkey)").alias("sk"))
        .groupBy("o_orderpriority")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    direct = orders.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").alias("est")
    )
    m = {r["o_orderpriority"]: r["est"] for r in merged.collect()}
    d = {r["o_orderpriority"]: r["est"] for r in direct.collect()}
    assert m == d
    rows = q_approx_distinct_union(spark, sf_dir).collect()
    assert rows and all(r["union_est_ok"] for r in rows)


def test_kcore_matches_python_fixpoint_peel(spark, sf_dir, points):
    edges = set()
    for i, (a, ax, ay) in enumerate(points):
        for b, bx, by in points:
            if a != b and (ax - bx) ** 2 + (ay - by) ** 2 < 0.05 * 0.05:
                edges.add((a, b))
    peels = 0
    while True:
        deg = defaultdict(int)
        for x, _ in edges:
            deg[x] += 1
        keep = {v for v, d in deg.items() if d >= _KCORE_K}
        new = {(x, y) for x, y in edges if x in keep and y in keep}
        if new == edges:
            break
        edges = new
        peels += 1
    assert peels <= _KCORE_ROUNDS, "bounded rounds must cover the fixpoint"
    want = defaultdict(int)
    for x, _ in edges:
        want[x] += 1
    got = {r["node"]: r["core_deg"] for r in q_kcore_membership(spark, sf_dir).collect()}
    assert got == dict(want)
    assert got, "core must be non-empty at test scale"
    assert min(got.values()) >= _KCORE_K
