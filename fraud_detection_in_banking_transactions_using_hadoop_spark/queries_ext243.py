"""Extension batch 243 (round 11): Gale-Shapley stable matching --
the matching-market classic next to the tier's OPTIMAL assignment
(exact 8x8 Hungarian-style enumeration, ext218): stability is a
different solution concept (no blocking pair) with a different
algorithm (deferred acceptance), and the proposer-optimal outcome is
UNIQUE regardless of proposal order (McVitie-Wilson) -- the law that
lets the Spark driver fold and the SQL oracle pick their own orders
and still agree bit-for-bit (pinned by a fuzz pytest here).

Market: 25 customer nations propose to 25 supplier nations;
preferences = traded line counts (desc, id tiebreak) over the
complete 25x25 spine (missing pairs weigh 0). The oracle replays
deferred acceptance one PROPOSAL per recursion level with the
smallest-free-proposer rule: state = (next-proposal-index list,
acceptor->proposer match list), preference and rank matrices carried
as MATERIALIZED list-of-list tables; <= 625 levels of constant work.
The driver fold runs the same rule in exact Python integers. Output:
each pair with both sides' realized preference ranks (the
proposer-optimality signature: proposer ranks skew low)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_N = 25

_W_SQL = """
    pay AS (
      SELECT c.c_nationkey AS i, s.s_nationkey AS j,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    spine AS (
      -- wrap the cross of the two unnests before the LEFT JOIN:
      -- DuckDB rejects non-inner joins on correlated columns
      SELECT ab.i, ab.j, coalesce(p.w, 0) AS w
      FROM (SELECT a.a AS i, b.b AS j
            FROM (SELECT unnest(range(0, 25)) AS a) a,
                 (SELECT unnest(range(0, 25)) AS b) b) ab
      LEFT JOIN pay p ON p.i = ab.i AND p.j = ab.j),
    pp AS (SELECT i, j,
                  CAST(row_number() OVER (PARTITION BY i
                    ORDER BY w DESC, j) AS BIGINT) AS r
           FROM spine),
    ra AS (SELECT j, i,
                  CAST(row_number() OVER (PARTITION BY j
                    ORDER BY w DESC, i) AS BIGINT) AS r
           FROM spine),
    ppm AS MATERIALIZED (
      SELECT list(js ORDER BY i) AS m FROM (
        SELECT i, list(j ORDER BY r) AS js FROM pp GROUP BY i)),
    ram AS MATERIALIZED (
      SELECT list(rs ORDER BY j) AS m FROM (
        SELECT j, list(r ORDER BY i) AS rs FROM ra GROUP BY j))
"""


_GS_ORACLE = f"""
    WITH RECURSIVE {_W_SQL},
    gs AS (
      SELECT CAST(0 AS BIGINT) AS k,
             list_transform(range(0, 25), q -> CAST(1 AS BIGINT)) AS nxt,
             list_transform(range(0, 25), q -> CAST(-1 AS BIGINT)) AS mt
      FROM ppm
      UNION ALL
      SELECT k + 1,
             list_transform(range(0, 25), q ->
               CASE WHEN q = p THEN nxt[CAST(p AS INTEGER) + 1] + 1
                    ELSE nxt[CAST(q AS INTEGER) + 1] END),
             CASE WHEN acc THEN list_transform(range(0, 25), q ->
                    CASE WHEN q = tj THEN p
                         ELSE mt[CAST(q AS INTEGER) + 1] END)
                  ELSE mt END
      FROM (
        -- free proposer via a correlated aggregate over an unnest
        -- spine (lambdas cannot capture LATERAL-correlated columns)
        SELECT g.k, g.nxt, g.mt, t0.p, t1.tj,
               (g.mt[CAST(t1.tj AS INTEGER) + 1] = -1
                OR r.m[CAST(t1.tj AS INTEGER) + 1][CAST(t0.p AS INTEGER) + 1]
                   < r.m[CAST(t1.tj AS INTEGER) + 1]
                      [CAST(g.mt[CAST(t1.tj AS INTEGER) + 1] AS INTEGER) + 1])
                 AS acc
        FROM gs g
        CROSS JOIN ppm pm
        CROSS JOIN ram r,
        LATERAL (SELECT min(qs.q) AS p
                 FROM (SELECT unnest(range(0, 25)) AS q) qs
                 WHERE NOT list_contains(g.mt, CAST(qs.q AS BIGINT))
                   AND g.nxt[CAST(qs.q AS INTEGER) + 1] <= 25) t0,
        LATERAL (SELECT pm.m[CAST(t0.p AS INTEGER) + 1]
                   [CAST(g.nxt[CAST(t0.p AS INTEGER) + 1] AS INTEGER)]
                   AS tj) t1
        WHERE t0.p IS NOT NULL)),
    fin AS (
      SELECT mt FROM gs
      WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT unnest(range(0, 25)) AS q)
        WHERE NOT list_contains(mt, CAST(q AS BIGINT)))),
    pairs AS (
      SELECT mt[CAST(jj.j AS INTEGER) + 1] AS proposer,
             CAST(jj.j AS BIGINT) AS acceptor
      FROM fin, LATERAL (SELECT unnest(range(0, 25)) AS j) jj)
    SELECT pr.proposer, pr.acceptor,
           pp.r AS proposer_rank, ra.r AS acceptor_rank
    FROM pairs pr
    JOIN pp ON pp.i = pr.proposer AND pp.j = pr.acceptor
    JOIN ra ON ra.j = pr.acceptor AND ra.i = pr.proposer
"""


def gale_shapley(prefs_p, ranks_a):
    """Deferred acceptance, smallest-free-proposer order; prefs_p[i] =
    ordered acceptor list, ranks_a[j][i] = acceptor j's rank of i."""
    n = len(prefs_p)
    nxt = [0] * n
    match_of = [-1] * n  # acceptor -> proposer
    while True:
        free = [
            i
            for i in range(n)
            if i not in match_of and nxt[i] < len(prefs_p[i])
        ]
        if not free:
            break
        p = min(free)
        j = prefs_p[p][nxt[p]]
        nxt[p] += 1
        cur = match_of[j]
        if cur == -1 or ranks_a[j][p] < ranks_a[j][cur]:
            match_of[j] = p
    return match_of


@register(
    "gale_shapley_stable",
    _GS_ORACLE,
    tags=("matching", "or", "exact-arith", "bounded-fold"),
)
def q_gale_shapley_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proposer-optimal stable matching of customer nations to
    supplier nations by traded volume (module docstring): bounded
    driver fold vs the one-proposal-per-level recursive oracle;
    identical by McVitie-Wilson order independence."""
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
        .groupBy(
            F.col("c_nationkey").alias("i"), F.col("s_nationkey").alias("j")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    rows = collect_nonempty(pay, "gale-shapley trade weights")
    w = {(int(r["i"]), int(r["j"])): int(r["w"]) for r in rows}
    prefs_p = [
        sorted(range(_N), key=lambda j: (-w.get((i, j), 0), j))
        for i in range(_N)
    ]
    ranks_a = [
        {
            i: r
            for r, i in enumerate(
                sorted(range(_N), key=lambda i: (-w.get((i, j), 0), i))
            )
        }
        for j in range(_N)
    ]
    match_of = gale_shapley(prefs_p, ranks_a)

    out = []
    for j, p in enumerate(match_of):
        prank = prefs_p[p].index(j) + 1
        arank = ranks_a[j][p] + 1
        out.append((p, j, prank, arank))
    return spark.createDataFrame(
        out,
        "proposer long, acceptor long, proposer_rank long, acceptor_rank long",
    )
