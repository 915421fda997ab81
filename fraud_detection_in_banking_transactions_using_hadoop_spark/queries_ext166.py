"""Extension batch 166 (round 6): two cascade-model ranking metrics
and a design-based sampling estimator -- ERR@10 (expected reciprocal
rank: the cascade-click model where a satisfied user STOPS, so a
highly relevant document shadows everything below it -- the
position-dependence NDCG's independent-gaze model cannot express),
RBP@10 (rank-biased precision: geometric persistence p = 0.8, the
bounded-tail metric whose residual p^K quantifies what the cutoff can
hide), and the Horvitz-Thompson total estimator over a deterministic
stratified Bernoulli sample (priority-dependent md5 inclusion
probabilities; the estimate and its Poisson-sampling SE carry exact
1/pi integer weights, benchmarked against the TRUE total, which a
synthetic benchmark can actually do).

Cross-engine discipline:
- The ranked list is the ndcg_at_k train-popularity top-10; graded
  relevance g = min(eval quantity, 4) maps to the cascade probability
  numerator 2^g - 1 over 16 (exact 16ths).
- ERR's stop-probability prefix products are integer products of
  (16 - num) recovered EXACTLY from exp-sum-of-logs rounding (the
  product is < 16^9, absolute float error ~1e-4 << 0.5); each
  position term is then one integer floor-division.
- RBP discounts (1-p) p^(i-1) enter as shared e12 Python literals.
- HT: md5-prefix buckets (the pipeline sampling convention) give
  pi in {0.05, 0.02, 0.01}; weights 20/50/100 are exact integers, so
  the estimator and its variance fold without floats.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_K = 10
_SPLIT = "1998-07-01"
_GMAX = 4
_P_RBP = 0.8
_RBP_E12 = [round((1 - _P_RBP) * _P_RBP ** i * 1e12) for i in range(_K)]
_RBP_SQL = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_RBP_E12))
# stratified Bernoulli inclusion: md5 bucket of o_orderkey mod 1000
_THR = {"1-URGENT": 50, "2-HIGH": 20}  # else 10 -> pi = thr/1000
_W = {50: 20, 20: 50, 10: 100}  # exact 1/pi


def _pop_rel_sql() -> str:
    return f"""
    r AS (
      SELECT o.o_custkey AS u, l.l_partkey AS i,
             CAST(l.l_quantity AS BIGINT) AS q, o.o_orderdate AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    pop AS (
      SELECT i, row_number() OVER (ORDER BY sum(q) DESC, i) AS pos
      FROM r WHERE d < DATE '{_SPLIT}' GROUP BY i
      ORDER BY sum(q) DESC, i LIMIT {_K}),
    rel AS (
      SELECT u, i, CAST(least(sum(q), {_GMAX}) AS BIGINT) AS g
      FROM r WHERE d >= DATE '{_SPLIT}' GROUP BY u, i),
    users AS (SELECT DISTINCT u FROM rel),
    grid AS (
      SELECT users.u, pop.pos,
             coalesce(CAST(power(2, rel.g) AS BIGINT) - 1, 0) AS num
      FROM users CROSS JOIN pop
      LEFT JOIN rel ON rel.u = users.u AND rel.i = pop.i)
    """


def _pop_rel(spark: SparkSession, sf_dir: str):
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    r = lineitem.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        F.col("o_custkey").alias("u"),
        F.col("l_partkey").alias("i"),
        F.col("l_quantity").cast("bigint").alias("q"),
        F.col("o_orderdate").alias("d"),
    )
    pop = (
        r.where(F.col("d") < F.lit(_SPLIT).cast("date"))
        .groupBy("i")
        .agg(F.sum("q").alias("sq"))
        .select(
            "i",
            F.row_number()
            .over(Window.orderBy(F.col("sq").desc(), "i"))
            .alias("pos"),
        )
        .where(F.col("pos") <= _K)
    )
    rel = (
        r.where(F.col("d") >= F.lit(_SPLIT).cast("date"))
        .groupBy("u", "i")
        .agg(F.least(F.sum("q"), F.lit(_GMAX)).cast("bigint").alias("g"))
    )
    users = rel.select("u").distinct()
    grid = (
        users.crossJoin(F.broadcast(pop))
        .join(
            rel.select(
                F.col("u").alias("ru"), F.col("i").alias("ri"), "g"
            ),
            (F.col("ru") == F.col("u")) & (F.col("ri") == F.col("i")),
            "left",
        )
        .select(
            "u",
            "pos",
            F.coalesce(
                F.pow(F.lit(2), F.col("g")).cast("bigint") - 1, F.lit(0)
            ).alias("num"),
        )
    )
    return grid


@register(
    "err_at_k",
    f"""
    WITH {_pop_rel_sql()},
    pp AS (
      SELECT u, pos, num,
             CAST(round(exp(coalesce(sum(ln(16 - num)) OVER (
               PARTITION BY u ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)), 0)
               AS HUGEINT) AS stopprod
      FROM grid),
    terms AS (
      SELECT u,
             CAST(sum((CAST(1000000000 AS HUGEINT) * num * stopprod)
                  // (pos * CAST(power(16, pos) AS HUGEINT))) AS HUGEINT)
               AS err_e9
      FROM pp GROUP BY u),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(err_e9) AS HUGEINT) AS s,
             CAST(max(err_e9) AS BIGINT) AS mx
      FROM terms)
    SELECT n_users,
           round(CAST(s AS DOUBLE) / 1e9 / n_users, 6) AS mean_err,
           round(CAST(mx AS DOUBLE) / 1e9, 6) AS max_err
    FROM agg
    """,
    tags=("ml", "ranking", "cascade"),
)
def q_err_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERR@10 (Chapelle's cascade model) of the train-popularity
    ranking against eval-period graded relevance: at each position
    the user is satisfied with probability R = (2^g - 1)/16 and stops;
    ERR = sum (1/i) R_i prod_{j<i} (1 - R_j). The stop products are
    exact integers (products of (16 - num), recovered by rounding
    exp-sum-logs -- < 16^9 so float error cannot reach 0.5); each term
    is one integer floor-division at e9. Unlike NDCG's independent
    positions, one g=4 hit near the top crushes every lower
    contribution -- the metric search teams actually cascade-test."""
    grid = _pop_rel(spark, sf_dir)
    w = (
        Window.partitionBy("u")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pp = grid.select(
        "u",
        "pos",
        "num",
        F.round(
            F.exp(
                F.coalesce(
                    F.sum(F.log(16 - F.col("num"))).over(w), F.lit(0.0)
                )
            ),
            0,
        )
        .cast(_DEC)
        .alias("stopprod"),
    )
    terms = pp.groupBy("u").agg(
        F.sum(
            F.expr(
                "CAST((CAST(1000000000 AS DECIMAL(38,0)) * num * stopprod)"
                " DIV (pos * CAST(power(16, pos) AS DECIMAL(38,0)))"
                " AS BIGINT)"
            )
        )
        .cast(_DEC)
        .alias("err_e9")
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("err_e9").cast(_DEC).alias("s"),
        F.max("err_e9").cast("bigint").alias("mx"),
    )
    return agg.select(
        "n_users",
        F.round(
            F.col("s").cast("double") / 1e9 / F.col("n_users"), 6
        ).alias("mean_err"),
        F.round(F.col("mx").cast("double") / 1e9, 6).alias("max_err"),
    )


@register(
    "rbp_at_k",
    f"""
    WITH {_pop_rel_sql()},
    disc AS (SELECT * FROM (VALUES {_RBP_SQL}) AS t(pos, w_e12)),
    terms AS (
      SELECT g.u, CAST(sum(g.num * d.w_e12) AS HUGEINT) AS s_e12
      FROM grid g JOIN disc d ON d.pos = g.pos
      GROUP BY g.u),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(s_e12) AS HUGEINT) AS s,
             CAST(max(s_e12) AS HUGEINT) AS mx
      FROM terms)
    SELECT n_users,
           round(CAST(s AS DOUBLE) / 15.0 / 1e12 / n_users, 6) AS mean_rbp,
           round(CAST(mx AS DOUBLE) / 15.0 / 1e12, 6) AS max_rbp,
           round({_P_RBP ** _K!r}, 6) AS residual_uncertainty
    FROM agg
    """,
    tags=("ml", "ranking", "persistence"),
)
def q_rbp_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased precision at 10 (Moffat-Zobel, persistence 0.8):
    RBP = (1-p) sum p^(i-1) r_i with graded r = (2^g - 1)/15. The
    geometric user model bounds what positions beyond K can add --
    the reported residual p^K = 0.107 is that uncertainty, the
    honesty term NDCG@K lacks. Discount weights are shared e12
    Python literals; per-user sums are exact integer dots over the
    same popularity/relevance grid as ndcg_at_k/err_at_k."""
    grid = _pop_rel(spark, sf_dir)
    disc = spark.createDataFrame(
        [(i + 1, w) for i, w in enumerate(_RBP_E12)], "pos INT, w_e12 LONG"
    )
    terms = (
        grid.join(F.broadcast(disc), "pos")
        .groupBy("u")
        .agg(
            F.sum(F.col("num") * F.col("w_e12")).cast(_DEC).alias("s_e12")
        )
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("s_e12").cast(_DEC).alias("s"),
        F.max("s_e12").cast(_DEC).alias("mx"),
    )
    return agg.select(
        "n_users",
        F.round(
            F.col("s").cast("double") / 15.0 / 1e12 / F.col("n_users"), 6
        ).alias("mean_rbp"),
        F.round(F.col("mx").cast("double") / 15.0 / 1e12, 6).alias(
            "max_rbp"
        ),
        F.round(F.lit(_P_RBP**_K), 6).alias("residual_uncertainty"),
    )


@register(
    "horvitz_thompson_total",
    f"""
    WITH marked AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
               % 1000 AS h,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 50
                  WHEN o_orderpriority = '2-HIGH' THEN 20
                  ELSE 10 END AS thr
      FROM orders),
    samp AS (
      SELECT cents, thr,
             CASE thr WHEN 50 THEN 20 WHEN 20 THEN 50 ELSE 100 END AS w
      FROM marked WHERE h < thr),
    est AS (
      SELECT CAST(count(*) AS BIGINT) AS n_sampled,
             CAST(sum(CAST(cents AS HUGEINT) * w) AS HUGEINT) AS ht_cents,
             CAST(sum(CAST(cents AS HUGEINT) * cents * w * (w - 1))
                  AS HUGEINT) AS var_cents2
      FROM samp),
    truth AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(cents) AS HUGEINT) AS true_cents
      FROM marked)
    SELECT e.n_sampled, t.n_total,
           CAST(e.ht_cents // 100 AS BIGINT) AS ht_total_dollars,
           CAST(t.true_cents // 100 AS BIGINT) AS true_total_dollars,
           round((CAST(e.ht_cents AS DOUBLE) - CAST(t.true_cents AS DOUBLE))
                 / CAST(t.true_cents AS DOUBLE), 6) + 0.0 AS rel_error,
           round(sqrt(CAST(e.var_cents2 AS DOUBLE)) / 100.0, 2)
             AS se_dollars
    FROM est e CROSS JOIN truth t
    """,
    tags=("sampling", "survey", "estimator"),
)
def q_horvitz_thompson_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson estimate of total order revenue from a
    deterministic stratified Bernoulli sample: md5-bucket inclusion
    with pi = 5% for URGENT, 2% for HIGH, 1% otherwise; HT total =
    sum y/pi with EXACT integer weights 20/50/100, and the Poisson-
    sampling variance sum y^2 (1-pi)/pi^2 = sum y^2 w(w-1) folds the
    same way. Because the data is synthetic the TRUE total is also
    computed -- the relative error lands inside ~2 SE, the check a
    production sampling pipeline can never run."""
    orders = read_table(spark, sf_dir, "orders")
    marked = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4),
                16,
                10,
            ).cast("bigint")
            % 1000
        ).alias("h"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 50)
        .when(F.col("o_orderpriority") == "2-HIGH", 20)
        .otherwise(10)
        .alias("thr"),
    )
    samp = marked.where(F.col("h") < F.col("thr")).select(
        "cents",
        "thr",
        F.when(F.col("thr") == 50, 20)
        .when(F.col("thr") == 20, 50)
        .otherwise(100)
        .alias("w"),
    )
    est = samp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum(F.col("cents").cast(_DEC) * F.col("w")).cast(_DEC).alias(
            "ht_cents"
        ),
        F.sum(
            F.col("cents").cast(_DEC)
            * F.col("cents")
            * F.col("w")
            * (F.col("w") - 1)
        )
        .cast(_DEC)
        .alias("var_cents2"),
    )
    truth = marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("cents").cast(_DEC).alias("true_cents"),
    )
    return est.crossJoin(F.broadcast(truth)).select(
        "n_sampled",
        "n_total",
        F.expr("CAST(ht_cents DIV 100 AS BIGINT)").alias("ht_total_dollars"),
        F.expr("CAST(true_cents DIV 100 AS BIGINT)").alias(
            "true_total_dollars"
        ),
        (
            F.round(
                (
                    F.col("ht_cents").cast("double")
                    - F.col("true_cents").cast("double")
                )
                / F.col("true_cents").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("rel_error"),
        F.round(
            F.sqrt(F.col("var_cents2").cast("double")) / 100.0, 2
        ).alias("se_dollars"),
    )
