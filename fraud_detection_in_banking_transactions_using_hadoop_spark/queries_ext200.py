"""Extension batch 200 (round 8): exact classical graph algorithms on
the sparsified 25-nation payment graph -- betweenness centrality,
eccentricity/diameter, and the maximum spanning backbone (Prim) -- all
through the round-8 bounded-fold discipline: the data-dependent 4-way
join builds the weighted adjacency DISTRIBUTED, the <=25-node graph
algorithms run driver-side in exact integer arithmetic, and the DuckDB
oracles recompute them from scratch (unrolled walk-count matrix powers
for shortest paths; a recursive LATERAL CTE replaying Prim's greedy
step sequence).

Graph construction (shared, deterministic): symmetrized line-count
weights w(i,j); keep each node's top-3 heaviest incident edges
(rank-based sparsification, ties by neighbor id -- percentile-free so
both engines agree exactly), then re-symmetrize. The dense payment
graph is near-complete, where betweenness degenerates; the top-k
backbone is the standard sparsification that makes path structure
meaningful.

Cross-engine exactness: shortest-path distances/counts are integers
(walks of length dist(s,t) are exactly the shortest paths, so the
k-th adjacency power at k = dist counts them); per-(s,t,v) betweenness
contributions quantize to integers via (1e9 * sigma_sv * sigma_vt) DIV
sigma_st BEFORE the order-free integer sum; pairs beyond {_KMAX} hops
are excluded identically on both sides."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_TOPK = 3  # edges kept per node before re-symmetrizing
_KMAX = 8  # BFS horizon (diameter bound both engines enforce)

_GRAPH_SQL = """
    pay AS (
      SELECT c.c_nationkey AS na, s.s_nationkey AS nb,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    sym AS (
      SELECT na AS i, nb AS j, CAST(sum(cnt) AS BIGINT) AS w
      FROM (SELECT na, nb, cnt FROM pay
            UNION ALL SELECT nb, na, cnt FROM pay) x
      WHERE na <> nb GROUP BY 1, 2),
    keep AS (
      SELECT i, j, w FROM (
        SELECT i, j, w,
               row_number() OVER (PARTITION BY i ORDER BY w DESC, j) AS rn
        FROM sym)
      WHERE rn <= 3),
    wedges AS (
      SELECT i AS a, j AS b, w FROM keep
      UNION
      SELECT j, i, w FROM keep),
    edges AS (SELECT a, b FROM wedges)
"""


def _powers_sql() -> str:
    parts = [
        "p1 AS MATERIALIZED (SELECT a AS s, b AS t,"
        " CAST(1 AS HUGEINT) AS c FROM edges)"
    ]
    for k in range(2, _KMAX + 1):
        parts.append(
            f"""p{k} AS MATERIALIZED (
      SELECT p.s, e.b AS t, CAST(sum(p.c) AS HUGEINT) AS c
      FROM p{k - 1} p JOIN edges e ON e.a = p.t GROUP BY 1, 2)"""
        )
    allk = " UNION ALL ".join(
        f"SELECT s, t, {k} AS k, c FROM p{k}" for k in range(1, _KMAX + 1)
    )
    parts.append(
        f"""sp AS MATERIALIZED (
      SELECT s, t, CAST(min(k) AS BIGINT) AS d, arg_min(c, k) AS sig
      FROM ({allk}) u WHERE s <> t GROUP BY s, t)"""
    )
    return ",\n    ".join(parts)


def _collect_graph(spark: SparkSession, sf_dir: str):
    """Distributed head: weighted symmetric adjacency, collected once
    (bounded <=25x24 integer cells), then sparsified to the top-3
    backbone exactly as the SQL does."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    pay = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("na"), F.col("s_nationkey").alias("nb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    sym_rows = collect_nonempty(
        pay.select("na", "nb", "cnt")
        .unionAll(
            pay.select(F.col("nb").alias("na"), F.col("na").alias("nb"), "cnt")
        )
        .where(F.col("na") != F.col("nb"))
        .groupBy(F.col("na").alias("i"), F.col("nb").alias("j"))
        .agg(F.sum("cnt").cast("bigint").alias("w")),
        "payment-backbone nation edges",
    )
    sym = {(r["i"], r["j"]): r["w"] for r in sym_rows}
    by_i: dict[int, list] = {}
    for (i, j), w in sym.items():
        by_i.setdefault(i, []).append((j, w))
    wedges: dict[tuple[int, int], int] = {}
    for i, nbrs in by_i.items():
        nbrs.sort(key=lambda x: (-x[1], x[0]))
        for j, w in nbrs[:_TOPK]:
            wedges[(i, j)] = w
            wedges[(j, i)] = w
    nodes = sorted({a for a, _ in wedges})
    adj: dict[int, list[int]] = {n: [] for n in nodes}
    for a, b in wedges:
        adj[a].append(b)
    for n in nodes:
        adj[n].sort()
    return nodes, adj, wedges


def _bfs_all_pairs(nodes, adj):
    """dist/sigma for all ordered pairs within _KMAX hops: per-source
    BFS with shortest-path counting (== the oracle's adjacency-power
    counts at k = dist)."""
    dist: dict[tuple[int, int], int] = {}
    sig: dict[tuple[int, int], int] = {}
    for s in nodes:
        d = {s: 0}
        c = {s: 1}
        frontier = [s]
        depth = 0
        while frontier and depth < _KMAX:
            depth += 1
            nxt: dict[int, int] = {}
            for u in frontier:
                for v in adj[u]:
                    if v in d:  # discovered at an earlier depth
                        continue
                    nxt[v] = nxt.get(v, 0) + c[u]
            for v, cv in nxt.items():
                d[v], c[v] = depth, cv
            frontier = sorted(nxt)
        for t, dt in d.items():
            if t != s:
                dist[(s, t)] = dt
                sig[(s, t)] = c[t]
    return dist, sig


@register(
    "betweenness_brandes_nations",
    f"""
    WITH {_GRAPH_SQL},
    {_powers_sql()},
    nodes AS (SELECT DISTINCT a AS v FROM edges),
    contrib AS (
      SELECT sv.t AS v,
             CAST(sum((1000000000 * sv.sig * vt.sig) // st.sig) AS BIGINT)
               AS bc_q
      FROM sp st
      JOIN sp sv ON sv.s = st.s
      JOIN sp vt ON vt.t = st.t AND vt.s = sv.t
      WHERE sv.t <> st.s AND sv.t <> st.t AND sv.d + vt.d = st.d
      GROUP BY sv.t)
    SELECT n.v AS nationkey, CAST(coalesce(c.bc_q, 0) AS BIGINT) AS bc_q,
           round(CAST(coalesce(c.bc_q, 0) AS DOUBLE) / 1000000000.0
                 / ((cnt.n - 1) * (cnt.n - 2)), 6) AS bc_norm
    FROM nodes n
    LEFT JOIN contrib c ON c.v = n.v
    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes) cnt
    """,
    tags=("graph", "centrality", "exact-arith"),
)
def q_betweenness_brandes_nations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact betweenness centrality on the top-3 payment backbone:
    bc(v) = sum over ordered pairs (s,t), s!=v!=t, of the fraction of
    shortest s->t paths through v, each fraction quantized to an
    integer (1e9 * sigma_sv * sigma_vt DIV sigma_st) before the
    order-free sum -- hash-exact by construction. The oracle rebuilds
    dist/sigma from unrolled adjacency-power walk counts; the Spark
    side BFS-counts driver-side over the collected bounded adjacency
    (the r8 fold pattern, COVERAGE.md classification table)."""
    nodes, adj, _w = _collect_graph(spark, sf_dir)
    dist, sig = _bfs_all_pairs(nodes, adj)
    bc = {v: 0 for v in nodes}
    for (s, t), dst in dist.items():
        sst = sig[(s, t)]
        for v in nodes:
            if v == s or v == t:
                continue
            dsv = dist.get((s, v))
            dvt = dist.get((v, t))
            if dsv is None or dvt is None or dsv + dvt != dst:
                continue
            bc[v] += (1000000000 * sig[(s, v)] * sig[(v, t)]) // sst
    n = len(nodes)
    rows = [
        (v, bc[v], round(bc[v] / 1000000000.0 / ((n - 1) * (n - 2)), 6))
        for v in nodes
    ]
    return spark.createDataFrame(
        rows, "nationkey INT, bc_q LONG, bc_norm DOUBLE"
    )


@register(
    "graph_eccentricity_nations",
    f"""
    WITH {_GRAPH_SQL},
    {_powers_sql()},
    ecc AS (SELECT s AS v, CAST(max(d) AS BIGINT) AS ecc
            FROM sp GROUP BY s)
    SELECT e.v AS nationkey, e.ecc,
           g.diameter, g.radius,
           CAST(e.ecc = g.radius AS INTEGER) AS is_center
    FROM ecc e CROSS JOIN (
      SELECT CAST(max(ecc) AS BIGINT) AS diameter,
             CAST(min(ecc) AS BIGINT) AS radius
      FROM ecc) g
    """,
    tags=("graph", "exact-arith"),
)
def q_graph_eccentricity_nations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Eccentricity / diameter / radius of the top-3 payment backbone
    (hop metric, horizon {_KMAX}): ecc(v) = max over reachable t of
    dist(v,t); center nodes attain the radius. Same dist machinery as
    the betweenness query -- pure integers."""
    nodes, adj, _w = _collect_graph(spark, sf_dir)
    dist, _sig = _bfs_all_pairs(nodes, adj)
    ecc = {}
    for (s, _t), d in dist.items():
        ecc[s] = max(ecc.get(s, 0), d)
    diameter, radius = max(ecc.values()), min(ecc.values())
    rows = [
        (v, ecc[v], diameter, radius, 1 if ecc[v] == radius else 0)
        for v in sorted(ecc)
    ]
    return spark.createDataFrame(
        rows, "nationkey INT, ecc LONG, diameter LONG, radius LONG,"
        " is_center INT"
    )


@register(
    "payment_backbone_mst",
    f"""
    WITH RECURSIVE {_GRAPH_SQL},
    start AS (SELECT CAST(min(a) AS BIGINT) AS s0 FROM edges),
    fold AS (
      SELECT 0 AS k, [s0] AS visited, CAST(NULL AS BIGINT) AS ea,
             CAST(NULL AS BIGINT) AS eb, CAST(NULL AS BIGINT) AS ew
      FROM start
      UNION ALL
      SELECT f.k + 1, list_append(f.visited, pick.b),
             pick.a, pick.b, pick.w
      FROM fold f,
      LATERAL (SELECT CAST(e.a AS BIGINT) AS a, CAST(e.b AS BIGINT) AS b,
                      e.w
               FROM wedges e
               WHERE list_contains(f.visited, CAST(e.a AS BIGINT))
                 AND NOT list_contains(f.visited, CAST(e.b AS BIGINT))
               ORDER BY e.w DESC, e.a, e.b LIMIT 1) pick
      WHERE f.k < 100)
    SELECT CAST(k AS BIGINT) AS step,
           CAST(least(ea, eb) AS BIGINT) AS node_a,
           CAST(greatest(ea, eb) AS BIGINT) AS node_b,
           CAST(ew AS BIGINT) AS weight
    FROM fold WHERE ea IS NOT NULL
    """,
    tags=("graph", "mst", "exact-arith"),
)
def q_payment_backbone_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum spanning tree (Prim) of the weighted payment backbone:
    from the min-id node, repeatedly add the heaviest edge leaving the
    visited set (ties: smaller a, then b) -- the trade backbone that
    keeps every nation connected through its strongest links. The
    oracle replays the identical greedy sequence as a recursive LATERAL
    CTE carrying the visited list; the Spark side runs Prim driver-side
    over the collected bounded adjacency. Emits the insertion order,
    canonicalized endpoints, and exact integer weights."""
    nodes, _adj, wedges = _collect_graph(spark, sf_dir)
    visited = [min(nodes)]
    vis = {min(nodes)}
    rows = []
    k = 0
    while True:
        cands = [
            (a, b, w)
            for (a, b), w in wedges.items()
            if a in vis and b not in vis
        ]
        if not cands:
            break
        a, b, w = min(cands, key=lambda x: (-x[2], x[0], x[1]))
        k += 1
        vis.add(b)
        visited.append(b)
        rows.append((k, min(a, b), max(a, b), w))
    return spark.createDataFrame(
        rows, "step LONG, node_a LONG, node_b LONG, weight LONG"
    )
