"""Extension batch 218 (round 9): capacity planning (Universal
Scalability Law fit), exact combinatorial assignment, and k-truss
graph peeling.

- usl_scalability_fit: Gunther's USL X(N) = lam*N / (1 + sigma*(N-1)
  + kappa*N*(N-1)) fitted to (hourly concurrency, throughput) levels
  via the linearization N/X = a + b*N + c*N^2 -- exact-integer least
  squares (y quantizes to e9 rationals N*m*1e9 DIV s; normal-equation
  sums and the 3x3 Cramer determinants run in DECIMAL(38)/HUGEINT),
  then lam/sigma/kappa and the peak-concurrency point from the
  closed-form coefficient map. THE capacity question: does the system
  have contention (sigma) or coherency collapse (kappa)?
- optimal_assignment_volume: the 8x8 assignment problem (customer
  nations 0-7 -> supplier nations 0-7 maximizing matched payment
  volume) solved EXACTLY -- the oracle enumerates all 8! = 40,320
  permutations in one recursive CTE (bitmask-guarded), the Spark side
  is a bounded-state driver fold over the collected 64-cell volume
  matrix (COVERAGE loop table: O(1) state, O(1) input). Tie-break =
  lexicographically smallest assignment string. Output compares the
  optimum against the diagonal (identity) pairing.
- ktruss_membership: 4-truss peeling of the co-purchase part graph
  (every surviving edge needs >= 2 common neighbors among surviving
  edges), 4 unrolled peel rounds + a convergence flag -- the
  triangle-reinforced core that k-core (degree-based, already shipped)
  overestimates. Each round is one equi-join triangle count; edge
  tables are MATERIALIZED in the oracle (DuckDB re-inlines multiply-
  referenced CTEs otherwise -- the r6 lesson).
"""

from __future__ import annotations

import math
from itertools import permutations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_TRUSS_SUPPORT = 2  # k=4 truss: every edge in >= k-2 triangles
_TRUSS_ROUNDS = 4
_PCAP = 200  # part-key cap (label_propagation's bounded graph)


def _det3(cast: str, c1, c2, c3) -> str:
    """3x3 determinant SQL text over column triples (rows are the
    normal-equation rows); `cast` = DECIMAL(38,0) on Spark, HUGEINT on
    DuckDB (the probit r8 gotcha: Spark has no HUGEINT)."""
    a, b, c = c1
    d, e, f = c2
    g, h, i = c3

    def m(x, y):
        return f"(CAST({x} AS {cast}) * CAST({y} AS {cast}))"

    return (
        f"(CAST({a} AS {cast}) * ({m(e, i)} - {m(f, h)})"
        f" - CAST({b} AS {cast}) * ({m(d, i)} - {m(f, g)})"
        f" + CAST({c} AS {cast}) * ({m(d, h)} - {m(e, g)}))"
    )


def _usl_tail(cast: str, src: str = "sums") -> str:
    """Shared post-aggregation SQL: Cramer solve + USL parameter map.
    Sums: n, s1..s4 (powers of N), sy, sny, sn2y (y = e9 int)."""
    det = _det3(cast, ("n", "s1", "s2"), ("s1", "s2", "s3"), ("s2", "s3", "s4"))
    det_a = _det3(cast, ("sy", "s1", "s2"), ("sny", "s2", "s3"), ("sn2y", "s3", "s4"))
    det_b = _det3(cast, ("n", "sy", "s2"), ("s1", "sny", "s3"), ("s2", "sn2y", "s4"))
    det_c = _det3(cast, ("n", "s1", "sy"), ("s1", "s2", "sny"), ("s2", "s3", "sn2y"))
    return f"""
    coef AS (
      SELECT n,
             CAST({det} AS DOUBLE) AS dt,
             CAST({det_a} AS DOUBLE) AS da,
             CAST({det_b} AS DOUBLE) AS db,
             CAST({det_c} AS DOUBLE) AS dc
      FROM {src}),
    par AS (
      SELECT n,
             CASE WHEN dt = 0 THEN NULL ELSE da / dt END AS a9,
             CASE WHEN dt = 0 THEN NULL ELSE db / dt END AS b9,
             CASE WHEN dt = 0 THEN NULL ELSE dc / dt END AS c9
      FROM coef)
    SELECT CAST(n AS BIGINT) AS n_levels,
           round(a9 / 1e9, 6) + 0.0 AS coef_a,
           round(b9 / 1e9, 6) + 0.0 AS coef_b,
           round(c9 / 1e9, 6) + 0.0 AS coef_c,
           round(1e9 / (a9 + b9 + c9), 6) + 0.0 AS lambda_hat,
           round((b9 + c9) / (a9 + b9 + c9), 6) + 0.0 AS sigma_hat,
           round(c9 / (a9 + b9 + c9), 6) + 0.0 AS kappa_hat,
           CASE WHEN c9 <= 0 THEN NULL
                ELSE CAST(floor(sqrt((1.0 - (b9 + c9) / (a9 + b9 + c9))
                     / (c9 / (a9 + b9 + c9)))) AS BIGINT)
           END AS peak_concurrency
    FROM par
    """


@register(
    "usl_scalability_fit",
    f"""
    WITH hourly AS (
      SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(count(DISTINCT user_id) AS BIGINT) AS nu,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    lvl AS (
      SELECT nu, CAST(count(*) AS BIGINT) AS m, CAST(sum(x) AS BIGINT) AS s
      FROM hourly GROUP BY nu),
    pts AS (
      SELECT nu, (nu * m * 1000000000) // s AS y9 FROM lvl),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(nu) AS BIGINT) AS s1,
             CAST(sum(nu * nu) AS BIGINT) AS s2,
             CAST(sum(nu * nu * nu) AS BIGINT) AS s3,
             CAST(sum(nu * nu * nu * nu) AS BIGINT) AS s4,
             CAST(sum(y9) AS BIGINT) AS sy,
             CAST(sum(nu * y9) AS BIGINT) AS sny,
             CAST(sum(nu * nu * y9) AS BIGINT) AS sn2y
      FROM pts),
    {_usl_tail('HUGEINT')}
    """,
    tags=("capacity", "queueing", "regression", "exact-arith"),
)
def q_usl_scalability_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Universal Scalability Law fit on (hourly distinct-user
    concurrency, hourly event throughput) levels: exact-integer normal
    equations (y = N/X as the rational N*m*1e9 DIV s), a Cramer solve
    in wide integers, then lambda (ideal rate), sigma (contention),
    kappa (coherency) and the peak-concurrency point sqrt((1-sigma)/
    kappa). kappa > 0 = retrograde scaling past the peak."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.expr("unix_micros(ts) DIV 3600000000").alias("h")
    ).agg(
        F.countDistinct("user_id").cast("bigint").alias("nu"),
        F.count(F.lit(1)).cast("bigint").alias("x"),
    )
    lvl = hourly.groupBy("nu").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("s"),
    )
    pts = lvl.select(
        "nu", F.expr("(nu * m * 1000000000) DIV s").alias("y9")
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("nu").cast("bigint").alias("s1"),
        F.sum(F.expr("nu * nu")).cast("bigint").alias("s2"),
        F.sum(F.expr("nu * nu * nu")).cast("bigint").alias("s3"),
        F.sum(F.expr("nu * nu * nu * nu")).cast("bigint").alias("s4"),
        F.sum("y9").cast("bigint").alias("sy"),
        F.sum(F.expr("nu * y9")).cast("bigint").alias("sny"),
        F.sum(F.expr("nu * nu * y9")).cast("bigint").alias("sn2y"),
    )
    # reuse the shared tail text over the 1-row sums frame via
    # parameterized spark.sql DataFrame substitution -- no temp view,
    # so query construction stays free of session-global side effects
    # (r9 advice item: a view name collision under concurrent registry
    # consumers would silently rebind another query's plan).
    return spark.sql(
        "WITH " + _usl_tail("DECIMAL(38,0)", "{usl_sums}"), usl_sums=sums
    )


@register(
    "optimal_assignment_volume",
    """
    WITH RECURSIVE vol AS (
      SELECT c.c_nationkey AS i, s.s_nationkey AS j,
             CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS v
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey < 8 AND s.s_nationkey < 8
      GROUP BY 1, 2),
    cells AS MATERIALIZED (
      SELECT CAST(gi.i AS INTEGER) AS i, CAST(gj.j AS INTEGER) AS j,
             coalesce(v.v, 0) AS v
      FROM (SELECT unnest(range(0, 8)) AS i) gi
      CROSS JOIN (SELECT unnest(range(0, 8)) AS j) gj
      LEFT JOIN vol v ON v.i = gi.i AND v.j = gj.j),
    perm AS (
      SELECT 0 AS lvl, 0 AS mask, CAST('' AS VARCHAR) AS path,
             CAST(0 AS BIGINT) AS tot
      UNION ALL
      SELECT p.lvl + 1, p.mask | (1 << c.j),
             p.path || CAST(c.j AS VARCHAR), p.tot + c.v
      FROM perm p JOIN cells c ON c.i = p.lvl
        AND ((p.mask >> c.j) % 2) = 0
      WHERE p.lvl < 8),
    best AS (
      SELECT path, tot FROM perm WHERE lvl = 8
      ORDER BY tot DESC, path LIMIT 1),
    diag AS (SELECT CAST(sum(v) AS BIGINT) AS dv FROM cells WHERE i = j)
    SELECT w.i AS cust_nation,
           CAST(substr(b.path, w.i + 1, 1) AS INTEGER) AS supp_nation,
           c.v AS pair_volume_cents,
           b.tot AS optimal_total_cents,
           d.dv AS diagonal_total_cents
    FROM best b CROSS JOIN diag d
    CROSS JOIN (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS i) w
    JOIN cells c ON c.i = w.i
      AND c.j = CAST(substr(b.path, w.i + 1, 1) AS INTEGER)
    """,
    tags=("optimization", "assignment", "exact-arith"),
)
def q_optimal_assignment_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact 8x8 assignment: pair customer nations 0-7 with supplier
    nations 0-7 to maximize total matched payment volume. The oracle
    enumerates all 8! permutations in one bitmask-guarded recursive
    CTE; Spark collects the 64-cell volume matrix (bounded) and folds
    the same enumeration driver-side -- identical (max total,
    lexicographic path) tie-break. The diagonal pairing quantifies
    what optimizing buys."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    vol_rows = collect_nonempty(
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where((F.col("c_nationkey") < 8) & (F.col("s_nationkey") < 8))
        .groupBy(
            F.col("c_nationkey").alias("i"), F.col("s_nationkey").alias("j")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        ),
        "assignment volume matrix",
    )
    v = [[0] * 8 for _ in range(8)]
    for r in vol_rows:
        v[r["i"]][r["j"]] = r["v"]
    best_tot, best_path = None, None
    for p in permutations(range(8)):
        tot = sum(v[i][p[i]] for i in range(8))
        path = "".join(str(j) for j in p)
        if (
            best_tot is None
            or tot > best_tot
            or (tot == best_tot and path < best_path)
        ):
            best_tot, best_path = tot, path
    diag = sum(v[i][i] for i in range(8))
    rows = [
        (i, int(best_path[i]), v[i][int(best_path[i])], best_tot, diag)
        for i in range(8)
    ]
    return spark.createDataFrame(
        rows,
        "cust_nation int, supp_nation int, pair_volume_cents long,"
        " optimal_total_cents long, diagonal_total_cents long",
    )


def _truss_round_sql(k: int) -> str:
    """One peel round: adj{k} = symmetric closure of e{k}; e{k+1} =
    edges of e{k} with >= _TRUSS_SUPPORT common neighbors in adj{k}."""
    return f"""
    adj{k} AS MATERIALIZED (
      SELECT x AS u, y AS v FROM e{k}
      UNION ALL SELECT y, x FROM e{k}),
    supp{k} AS (
      SELECT e.x, e.y, CAST(count(*) AS BIGINT) AS s
      FROM e{k} e
      JOIN adj{k} a ON a.u = e.x
      JOIN adj{k} b ON b.u = e.y AND b.v = a.v
      GROUP BY e.x, e.y),
    e{k + 1} AS MATERIALIZED (
      SELECT s.x, s.y FROM supp{k} s WHERE s.s >= {_TRUSS_SUPPORT})
    """


@register(
    "ktruss_membership",
    f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_partkey < {_PCAP}),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
    {",".join(_truss_round_sql(k).strip() for k in range(_TRUSS_ROUNDS))}
    SELECT r.round,
           CASE r.round
             {" ".join(f"WHEN {k} THEN (SELECT CAST(count(*) AS BIGINT) FROM e{k})" for k in range(_TRUSS_ROUNDS + 1))}
           END AS n_edges,
           CAST((SELECT count(*) FROM e{_TRUSS_ROUNDS - 1})
                = (SELECT count(*) FROM e{_TRUSS_ROUNDS}) AS INTEGER)
             AS converged
    FROM (SELECT CAST(unnest(range(0, {_TRUSS_ROUNDS + 1})) AS INTEGER)
            AS round) r
    """,
    tags=("graph", "truss", "iterative"),
)
def q_ktruss_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss peeling of the capped co-purchase part graph: each round
    drops every edge with fewer than 2 common neighbors among the
    surviving edges, so what remains is the triangle-reinforced core
    (strictly stronger than k-core's degree criterion). Four unrolled
    rounds with a converged flag; each round is one triangle-count
    equi-join over the checkpointed edge set."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") < _PCAP)
        .select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    counts = [e.count()]
    for _ in range(_TRUSS_ROUNDS):
        adj = e.select(F.col("x").alias("u"), F.col("y").alias("v")).unionAll(
            e.select(F.col("y").alias("u"), F.col("x").alias("v"))
        )
        aa = adj.select(F.col("u").alias("ax"), F.col("v").alias("az"))
        bb = adj.select(F.col("u").alias("bu"), F.col("v").alias("bz"))
        supp = (
            e.join(aa, F.col("x") == F.col("ax"))
            .join(
                bb,
                (F.col("y") == F.col("bu")) & (F.col("az") == F.col("bz")),
            )
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).cast("bigint").alias("s"))
        )
        e = (
            supp.where(F.col("s") >= _TRUSS_SUPPORT)
            .select("x", "y")
            .localCheckpoint(eager=True)
        )
        counts.append(e.count())
    converged = int(counts[-2] == counts[-1])
    rows = [(k, counts[k], converged) for k in range(_TRUSS_ROUNDS + 1)]
    return spark.createDataFrame(
        rows, "round int, n_edges long, converged int"
    )
