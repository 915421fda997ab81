"""Extension batch 250 (round 11): targeted-attack robustness
(percolation) of the payment backbone -- the network-resilience
classic: remove hubs in degree order and watch the giant component
shatter. Complements the structural reads (betweenness, bow-tie,
k-core, rich club) with the DYNAMIC robustness curve regulators ask
for ("which institutions' removal fragments the payment network").

Graph: the ext200 symmetric top-3 backbone (rank-sparsified,
percentile-free). Attack order: degree desc with id tiebreak --
deterministic in both engines. For k = 0..5 removals the emitted row
is (k, nodes left, largest component, component count), computed by a
bounded union-find driver fold; the oracle re-derives each k's
partition with its own min-label reach recursion over the surviving
induced subgraph (six recursions in one WITH RECURSIVE, each over a
<=25-node edge set). tests pin the monotone laws (largest component
non-increasing in k; removing an isolated-from-giant node cannot
shrink the giant by more than its size) on planted graphs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_KMAX = 5

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
    edges AS (
      -- DISTINCT over UNION ALL, NOT bare UNION: inside a WITH
      -- RECURSIVE, DuckDB treats ANY "A UNION B" CTE as a degenerate
      -- recursive union and does NOT dedup between the branches
      -- (verified minimal repro: WITH RECURSIVE t AS (SELECT 1 UNION
      -- SELECT 1) has 2 rows) -- this silently double-counted
      -- symmetric backbone edges and flipped a degree tiebreak
      SELECT DISTINCT a, b FROM (
        SELECT i AS a, j AS b FROM keep
        UNION ALL
        SELECT j, i FROM keep)),
    nodes AS (SELECT DISTINCT a AS v FROM edges),
    deg AS (
      SELECT a AS v, CAST(count(*) AS BIGINT) AS d
      FROM edges GROUP BY a),
    atk AS (
      SELECT v, CAST(row_number() OVER (ORDER BY d DESC, v) AS BIGINT) AS rk
      FROM deg)
"""


def _reach_k(k: int) -> str:
    return f"""ek{k} AS (
      SELECT e.a, e.b FROM edges e
      JOIN atk ra ON ra.v = e.a
      JOIN atk rb ON rb.v = e.b
      WHERE ra.rk > {k} AND rb.rk > {k}),
    nk{k} AS (SELECT v FROM atk WHERE rk > {k}),
    reach{k}(node, r) AS (
      SELECT v, v FROM nk{k}
      UNION
      SELECT e.a, rr.r FROM ek{k} e JOIN reach{k} rr ON e.b = rr.node),
    comp{k} AS (
      SELECT node, min(r) AS cluster FROM reach{k} GROUP BY node),
    stat{k} AS (
      SELECT CAST({k} AS BIGINT) AS k,
             CAST(sum(sz) AS BIGINT) AS n_nodes,
             CAST(max(sz) AS BIGINT) AS largest_cc,
             CAST(count(*) AS BIGINT) AS n_components
      FROM (SELECT cluster, CAST(count(*) AS BIGINT) AS sz
            FROM comp{k} GROUP BY cluster) s)"""


_ATTACK_ORACLE = (
    "\n    WITH RECURSIVE "
    + _GRAPH_SQL
    + ",\n    "
    + ",\n    ".join(_reach_k(k) for k in range(_KMAX + 1))
    + "\n    "
    + " UNION ALL ".join(
        f"SELECT k, n_nodes, largest_cc, n_components FROM stat{k}"
        for k in range(_KMAX + 1)
    )
)


@register(
    "targeted_attack_robustness",
    _ATTACK_ORACLE,
    tags=("graph", "resilience", "percolation", "bounded-fold"),
)
def q_targeted_attack_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-targeted attack curve on the payment backbone (module
    docstring): bounded union-find fold per removal level vs six
    min-label reach recursions in the oracle."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    pay = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("na"), F.col("s_nationkey").alias("nb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    rows = collect_nonempty(pay, "attack backbone counts")
    wsum: dict = {}
    for r in rows:
        a, b, c = int(r["na"]), int(r["nb"]), int(r["cnt"])
        wsum[(a, b)] = wsum.get((a, b), 0) + c
        wsum[(b, a)] = wsum.get((b, a), 0) + c
    # top-3 per node, then re-symmetrize (the ext200 construction)
    kept = set()
    by_i: dict = {}
    for (i, j), w in wsum.items():
        by_i.setdefault(i, []).append((-w, j))
    for i, lst in by_i.items():
        for _, j in sorted(lst)[:3]:
            kept.add((i, j))
            kept.add((j, i))
    nodes = sorted({v for e in kept for v in e})
    deg = {v: sum(1 for (a, _) in kept if a == v) for v in nodes}
    order = sorted(nodes, key=lambda v: (-deg[v], v))

    def stats(removed: set):
        alive = [v for v in nodes if v not in removed]
        parent = {v: v for v in alive}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in kept:
            if a in parent and b in parent:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        sizes: dict = {}
        for v in alive:
            r = find(v)
            sizes[r] = sizes.get(r, 0) + 1
        return len(alive), max(sizes.values()), len(sizes)

    out = []
    for k in range(_KMAX + 1):
        n, big, nc = stats(set(order[:k]))
        out.append((k, n, big, nc))
    return spark.createDataFrame(
        out, "k long, n_nodes long, largest_cc long, n_components long"
    )
