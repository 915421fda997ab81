"""Extension batch 245 (round 11): two exact classics.

- panjer_aggregate_pmf: the Panjer recursion -- THE actuarial
  algorithm for the compound-Poisson aggregate-loss DISTRIBUTION
  (ext's compound_poisson_aggregate checks the variance identity;
  this computes the pmf itself). Frequency: per-user-day purchase
  Poisson rate lambda = P/(U*D) (a small rational, so the ratio
  series decays); severity: 8 price bands with count rationals
  c_j/N. Working in RATIOS r_k = g_k / g_0 removes e^-lambda
  entirely: r_0 = 1, r_k = (lambda/k) sum j f_j r_{k-j}, run in e15
  fixed point with ONE exact integer division per k
  (r_k = sum_j [j * P * c_j * r_{k-j}] // (k*U*D*N) -- numerators
  ~1e26 in HUGEINT/DECIMAL38, the r10 width discipline), and the
  emitted pmf is the normalized share r_k / sum r (exact ppm by
  integer division). tests pin the recursion against brute-force
  convolution of Poisson counts in exact fractions.

- smiths_rule_wspt: Smith's 1956 weighted-shortest-processing-time
  rule -- single-machine scheduling of the 25 nation workloads
  (p = line count, w = revenue dollars): WSPT (order by w/p desc,
  integer cross-multiplied comparator) minimizes sum w_j C_j; emitted
  against the SPT and FIFO orders with the optimality flags
  hash-checked; the exchange argument is fuzz-pinned vs brute-force
  permutation minimum.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_KMAX = 20
_E15 = 10**15


def panjer_ratios(P, U, D, N, c, kmax=_KMAX):
    """r_k in e15 fixed point (exact integer recursion; c = dict of
    band j in 1..8 -> count)."""
    r = [_E15] + [0] * kmax
    for k in range(1, kmax + 1):
        num = sum(
            j * P * c.get(j, 0) * r[k - j] for j in range(1, min(k, 8) + 1)
        )
        r[k] = num // (k * U * D * N)
    return r


_PANJER_ORACLE = f"""
    WITH RECURSIVE pur AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             least(8, 1 + CAST(round(value * 100, 0) AS BIGINT) // 8000)
               AS j
      FROM events WHERE event_type = 'purchase'),
    params AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS p,
             CAST(count(DISTINCT user_id) AS BIGINT) AS u,
             CAST(count(DISTINCT day) AS BIGINT) AS d
      FROM pur),
    sev AS (
      SELECT j, CAST(count(*) AS BIGINT) AS cj FROM pur GROUP BY j),
    sevl AS MATERIALIZED (
      SELECT list(coalesce(cj, 0) ORDER BY jj) AS cs,
             CAST(sum(coalesce(cj, 0)) AS BIGINT) AS n
      FROM (SELECT unnest(range(1, 9)) AS jj) s
      LEFT JOIN sev ON sev.j = s.jj),
    fold AS (
      SELECT CAST(0 AS BIGINT) AS k,
             CAST([{_E15}] AS HUGEINT[]) AS r
      FROM params
      UNION ALL
      SELECT f.k + 1,
             list_append(f.r,
               (SELECT CAST(coalesce(sum(
                  CAST(t.jj AS HUGEINT) * pa.p
                  * sl.cs[CAST(t.jj AS INTEGER)]
                  * f.r[CAST(f.k + 1 - t.jj + 1 AS INTEGER)]), 0) AS HUGEINT)
                FROM (SELECT unnest(range(1, 9)) AS jj) t
                WHERE t.jj <= f.k + 1)
               // ((f.k + 1) * pa.u * pa.d * sl.n))
      FROM fold f CROSS JOIN params pa CROSS JOIN sevl sl
      WHERE f.k < {_KMAX}),
    fin AS (SELECT r FROM fold WHERE k = {_KMAX}),
    tot AS (SELECT CAST(list_aggregate(r, 'sum') AS HUGEINT) AS s FROM fin)
    SELECT CAST(kk.k AS BIGINT) AS k,
           CAST(f.r[CAST(kk.k AS INTEGER) + 1] // 1000 AS BIGINT)
             AS ratio_e12,
           CAST((1000000 * f.r[CAST(kk.k AS INTEGER) + 1]) // t.s AS BIGINT)
             AS pmf_share_ppm
    FROM fin f CROSS JOIN tot t,
         LATERAL (SELECT unnest(range(0, {_KMAX + 1})) AS k) kk
"""


@register(
    "panjer_aggregate_pmf",
    _PANJER_ORACLE,
    tags=("actuarial", "risk", "exact-arith", "bounded-fold"),
)
def q_panjer_aggregate_pmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Panjer recursion for the compound-Poisson daily aggregate loss
    (module docstring): e15 fixed-point ratio series, one exact
    integer division per k, normalized shares in exact ppm."""
    ev = read_table(spark, sf_dir, "events")
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.expr(
            "least(8, 1 + CAST(round(value * 100, 0) AS BIGINT) DIV 8000)"
        ).alias("j"),
    )
    stats = pur.agg(
        F.count(F.lit(1)).cast("bigint").alias("p"),
        F.countDistinct("user_id").cast("bigint").alias("u"),
        F.countDistinct("day").cast("bigint").alias("d"),
    ).collect()[0]
    sev = {
        int(r["j"]): int(r["cj"])
        for r in pur.groupBy("j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cj"))
        .collect()
    }
    P, U, D = int(stats["p"]), int(stats["u"]), int(stats["d"])
    N = sum(sev.values())
    r = panjer_ratios(P, U, D, N, sev)
    s = sum(r)
    out = [
        (k, r[k] // 1000, (1_000_000 * r[k]) // s)
        for k in range(_KMAX + 1)
    ]
    return spark.createDataFrame(
        out, "k long, ratio_e12 long, pmf_share_ppm long"
    )


# ---------------------------------------------------------------------------
# Smith's rule (WSPT)
# ---------------------------------------------------------------------------
_WSPT_ORACLE = """
    WITH jobs AS (
      SELECT c.c_nationkey AS nid,
             CAST(count(*) AS BIGINT) AS p,
             CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                      // 100) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1),
    sched AS (
      SELECT nid, p, w,
             -- WSPT: w/p desc == order by exact rational via the
             -- integer key w * 1e6 // p (dense enough here), nid tiebreak
             row_number() OVER (ORDER BY (w * 1000000) // p DESC, nid)
               AS r_wspt,
             row_number() OVER (ORDER BY p, nid) AS r_spt,
             row_number() OVER (ORDER BY nid) AS r_fifo
      FROM jobs),
    obj AS (
      SELECT
        CAST(sum(w * c_wspt) AS HUGEINT) AS o_wspt,
        CAST(sum(w * c_spt) AS HUGEINT) AS o_spt,
        CAST(sum(w * c_fifo) AS HUGEINT) AS o_fifo
      FROM (
        SELECT w,
               sum(p) OVER (ORDER BY r_wspt
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_wspt,
               sum(p) OVER (ORDER BY r_spt
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_spt,
               sum(p) OVER (ORDER BY r_fifo
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_fifo
        FROM sched))
    SELECT CAST(o_wspt AS BIGINT) AS wspt_weighted_completion,
           CAST(o_spt AS BIGINT) AS spt_weighted_completion,
           CAST(o_fifo AS BIGINT) AS fifo_weighted_completion,
           CAST(o_wspt <= o_spt AS INTEGER) AS wspt_beats_spt,
           CAST(o_wspt <= o_fifo AS INTEGER) AS wspt_beats_fifo
    FROM obj
"""


@register(
    "smiths_rule_wspt",
    _WSPT_ORACLE,
    tags=("scheduling", "or", "exact-arith"),
)
def q_smiths_rule_wspt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smith's WSPT rule on the 25 nation workloads: exact integer
    weighted-completion objectives under WSPT / SPT / FIFO orders with
    the optimality flags hash-checked (module docstring)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    from pyspark.sql import Window

    jobs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nid"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("p"),
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * 100, 0) AS BIGINT) DIV 100"
                )
            )
            .cast("bigint")
            .alias("w"),
        )
    )
    sched = jobs.select(
        "nid",
        "p",
        "w",
        F.row_number()
        .over(Window.orderBy(F.expr("(w * 1000000) DIV p").desc(), "nid"))
        .alias("r_wspt"),
        F.row_number().over(Window.orderBy("p", "nid")).alias("r_spt"),
        F.row_number().over(Window.orderBy("nid")).alias("r_fifo"),
    )
    cums = sched.select(
        "w",
        F.sum("p")
        .over(Window.orderBy("r_wspt").rowsBetween(Window.unboundedPreceding, 0))
        .alias("c_wspt"),
        F.sum("p")
        .over(Window.orderBy("r_spt").rowsBetween(Window.unboundedPreceding, 0))
        .alias("c_spt"),
        F.sum("p")
        .over(Window.orderBy("r_fifo").rowsBetween(Window.unboundedPreceding, 0))
        .alias("c_fifo"),
    )
    return cums.agg(
        F.expr("CAST(sum(CAST(w AS DECIMAL(38,0)) * c_wspt) AS BIGINT)").alias(
            "wspt_weighted_completion"
        ),
        F.expr("CAST(sum(CAST(w AS DECIMAL(38,0)) * c_spt) AS BIGINT)").alias(
            "spt_weighted_completion"
        ),
        F.expr("CAST(sum(CAST(w AS DECIMAL(38,0)) * c_fifo) AS BIGINT)").alias(
            "fifo_weighted_completion"
        ),
        F.expr(
            "CAST(sum(CAST(w AS DECIMAL(38,0)) * c_wspt)"
            " <= sum(CAST(w AS DECIMAL(38,0)) * c_spt) AS INT)"
        ).alias("wspt_beats_spt"),
        F.expr(
            "CAST(sum(CAST(w AS DECIMAL(38,0)) * c_wspt)"
            " <= sum(CAST(w AS DECIMAL(38,0)) * c_fifo) AS INT)"
        ).alias("wspt_beats_fifo"),
    )
