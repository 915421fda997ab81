"""Re-derivations for ext218: USL normal equations in exact python
ints, assignment optimality bounds + permutation laws, and a python
set-based k-truss peel mirror."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_Q = {q.name: q.fn for q in registry()}


def test_usl_fit_matches_python_cramer(spark, sf_dir):
    hourly = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.expr("unix_micros(ts) DIV 3600000000").alias("h"))
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("nu"),
            F.count(F.lit(1)).cast("bigint").alias("x"),
        )
        .collect()
    )
    lvl = defaultdict(lambda: [0, 0])
    for r in hourly:
        lvl[r["nu"]][0] += 1
        lvl[r["nu"]][1] += r["x"]
    pts = [(nu, (nu * m * 10**9) // s) for nu, (m, s) in lvl.items()]
    n = len(pts)
    s1 = sum(nu for nu, _ in pts)
    s2 = sum(nu**2 for nu, _ in pts)
    s3 = sum(nu**3 for nu, _ in pts)
    s4 = sum(nu**4 for nu, _ in pts)
    sy = sum(y for _, y in pts)
    sny = sum(nu * y for nu, y in pts)
    sn2y = sum(nu * nu * y for nu, y in pts)

    def det3(r1, r2, r3):
        (a, b, c), (d, e, f), (g, h, i) = r1, r2, r3
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    dt = det3((n, s1, s2), (s1, s2, s3), (s2, s3, s4))
    assert dt != 0
    a9 = det3((sy, s1, s2), (sny, s2, s3), (sn2y, s3, s4)) / dt
    b9 = det3((n, sy, s2), (s1, sny, s3), (s2, sn2y, s4)) / dt
    c9 = det3((n, s1, sy), (s1, s2, sny), (s2, s3, sn2y)) / dt
    row = _Q["usl_scalability_fit"](spark, sf_dir).first()
    assert row["n_levels"] == n
    assert row["coef_a"] == pytest.approx(a9 / 1e9, abs=1e-5)
    assert row["coef_b"] == pytest.approx(b9 / 1e9, abs=1e-5)
    assert row["coef_c"] == pytest.approx(c9 / 1e9, abs=1e-5)
    tot = a9 + b9 + c9
    assert row["lambda_hat"] == pytest.approx(1e9 / tot, abs=1e-4)
    assert row["sigma_hat"] == pytest.approx((b9 + c9) / tot, abs=1e-5)
    assert row["kappa_hat"] == pytest.approx(c9 / tot, abs=1e-5)
    if c9 > 0:
        assert row["peak_concurrency"] == int(
            math.floor(
                math.sqrt((1.0 - (b9 + c9) / tot) / (c9 / tot))
            )
        )


def test_assignment_is_optimal_permutation(spark, sf_dir):
    rows = _Q["optimal_assignment_volume"](spark, sf_dir).collect()
    assert len(rows) == 8
    assert sorted(r["cust_nation"] for r in rows) == list(range(8))
    assert sorted(r["supp_nation"] for r in rows) == list(range(8))
    opt = rows[0]["optimal_total_cents"]
    diag = rows[0]["diagonal_total_cents"]
    assert all(r["optimal_total_cents"] == opt for r in rows)
    assert sum(r["pair_volume_cents"] for r in rows) == opt
    assert opt >= diag  # optimizing can't lose to the identity pairing
    # upper bound: sum of row maxima dominates any assignment
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .where((F.col("c_nationkey") < 8) & (F.col("s_nationkey") < 8))
        .groupBy("c_nationkey", "s_nationkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
        .collect()
    )
    row_max = defaultdict(int)
    for r in cells:
        row_max[r["c_nationkey"]] = max(row_max[r["c_nationkey"]], r["v"])
    assert opt <= sum(row_max.values())


def test_ktruss_matches_python_peel(spark, sf_dir):
    li = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") < 200)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_o = defaultdict(set)
    for r in li:
        by_o[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_o.values():
        ps = sorted(parts)
        for i, x in enumerate(ps):
            for y in ps[i + 1 :]:
                edges.add((x, y))
    counts = [len(edges)]
    for _ in range(4):
        adj = defaultdict(set)
        for x, y in edges:
            adj[x].add(y)
            adj[y].add(x)
        edges = {
            (x, y) for x, y in edges if len(adj[x] & adj[y]) >= 2
        }
        counts.append(len(edges))
    got = {
        r["round"]: (r["n_edges"], r["converged"])
        for r in _Q["ktruss_membership"](spark, sf_dir).collect()
    }
    conv = int(counts[-2] == counts[-1])
    assert got == {k: (counts[k], conv) for k in range(5)}
    # peeling is monotone
    assert all(a >= b for a, b in zip(counts, counts[1:]))
