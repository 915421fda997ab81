"""Extension batch 237 (round 11): SimRank structural similarity on
the sparsified payment digraph -- "two nations are similar if they are
paid by similar nations", the classic link-based similarity next to
the tier's Adamic-Adar / resource-allocation link predictors (which
score EDGES; SimRank scores arbitrary node pairs through recursive
neighborhood similarity).

Graph: the ext200 convention, directed -- customer-nation pays
supplier-nation, top-3 out-edges per source by line count
(deterministic rank sparsification, ties by neighbor id). SimRank with
c = 4/5 over IN-neighborhoods, 6 iterations from s0 = I, computed in
EXACT e9 fixed point: s'(a,b) = (4 * sum s(i,j)) // (5 |I(a)| |I(b)|)
with both engines' integer division truncating identically (r7 note),
so the fold is bit-exact -- no float anywhere.

Spark side follows the round-8 bounded-fold discipline: the 4-way join
builds the <=25-node adjacency DISTRIBUTED, the bounded edge list is
collected (collect_nonempty), the 6 rounds run driver-side in exact
Python integers, and the result re-enters the plan via
createDataFrame. The oracle recomputes the whole recursion as six
chained GROUP-BY CTEs (missing pairs ARE zeros, so the join-sum over
present rows is exact). tests/test_ext237_invariants.py pins the
textbook SimRank laws (symmetry, s(a,a)=1, c-bound, the two-star
closed form)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_ITERS = 6
_E9 = 1_000_000_000

_GRAPH_SQL = """
    pay AS (
      SELECT c.c_nationkey AS na, s.s_nationkey AS nb,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2),
    ed AS (
      SELECT na AS src, nb AS dst FROM (
        SELECT na, nb,
               row_number() OVER (PARTITION BY na ORDER BY cnt DESC, nb) AS rn
        FROM pay)
      WHERE rn <= 3),
    nodes AS (
      SELECT DISTINCT v FROM
        (SELECT src AS v FROM ed UNION SELECT dst FROM ed)),
    deg AS (SELECT dst, CAST(count(*) AS BIGINT) AS d FROM ed GROUP BY dst)
"""


def _iter_sql(k: int) -> str:
    return f"""s{k} AS MATERIALIZED (
      SELECT ea.dst AS a, eb.dst AS b,
             CAST((4 * CAST(sum(s.s) AS HUGEINT))
                  // (5 * CAST(da.d AS HUGEINT) * db.d) AS BIGINT) AS s
      FROM s{k - 1} s
      JOIN ed ea ON ea.src = s.a
      JOIN ed eb ON eb.src = s.b
      JOIN deg da ON da.dst = ea.dst
      JOIN deg db ON db.dst = eb.dst
      WHERE ea.dst <> eb.dst
      GROUP BY ea.dst, eb.dst, da.d, db.d
      UNION ALL
      SELECT v, v, CAST({_E9} AS BIGINT) FROM nodes)"""


_SIMRANK_ORACLE = (
    "\n    WITH "
    + _GRAPH_SQL
    + ",\n    s0 AS (SELECT a.v AS a, b.v AS b,\n"
    + f"      CAST(CASE WHEN a.v = b.v THEN {_E9} ELSE 0 END AS BIGINT) AS s\n"
    + "      FROM nodes a, nodes b),\n    "
    + ",\n    ".join(_iter_sql(k) for k in range(1, _ITERS + 1))
    + f"""
    SELECT a, b, s AS simrank_e9
    FROM s{_ITERS}
    WHERE a < b AND s > 0
    ORDER BY s DESC, a, b
    LIMIT 10
"""
)


@register(
    "simrank_backbone",
    _SIMRANK_ORACLE,
    tags=("graph", "similarity", "exact-arith", "bounded-fold"),
)
def q_simrank_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimRank (c=4/5, 6 rounds, exact e9 fixed point) on the top-3
    out-edge payment digraph; bounded driver fold per the round-8
    classification (25-node graph), oracle = six chained GROUP-BY
    CTEs. Top-10 off-diagonal pairs."""
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
    from pyspark.sql import Window

    ed_rows = collect_nonempty(
        pay.select(
            "na",
            "nb",
            F.row_number()
            .over(Window.partitionBy("na").orderBy(F.desc("cnt"), "nb"))
            .alias("rn"),
        ).where("rn <= 3"),
        "simrank backbone edges",
    )
    edges = [(int(r["na"]), int(r["nb"])) for r in ed_rows]
    nodes = sorted({v for e in edges for v in e})
    inn: dict[int, list[int]] = {v: [] for v in nodes}
    for srcv, dstv in edges:
        inn[dstv].append(srcv)

    s = {(a, b): (_E9 if a == b else 0) for a in nodes for b in nodes}
    for _ in range(_ITERS):
        nxt = {}
        for a in nodes:
            for b in nodes:
                if a == b:
                    nxt[(a, b)] = _E9
                    continue
                ia, ib = inn[a], inn[b]
                if not ia or not ib:
                    nxt[(a, b)] = 0
                    continue
                tot = sum(s[(i, j)] for i in ia for j in ib)
                nxt[(a, b)] = (4 * tot) // (5 * len(ia) * len(ib))
        s = nxt

    out = sorted(
        ((a, b, v) for (a, b), v in s.items() if a < b and v > 0),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:10]
    return spark.createDataFrame(
        out, "a long, b long, simrank_e9 long"
    )
