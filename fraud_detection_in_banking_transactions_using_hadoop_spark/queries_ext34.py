"""Extension batch 34: distributed decision-stump split search, Hill
tail-index estimation, and an exposure-adjusted rate test.

Scale notes (the 100 TB story per query):
- decision_stump_split is the inner loop of distributed decision-tree
  training (XGBoost/LightGBM-style): every distinct feature value is a
  candidate threshold, its left/right label counts come from ONE
  cumulative pass over the distinct-value spine (ties are spine rows,
  the mann_whitney machinery), and the best split is an ordered-limit
  argmin -- no per-candidate rescans, no global sort. Weighted Gini is
  exact rational -> e12 integer per candidate, so the argmin is
  deterministic cross-engine.
- hill_tail_index is the EVT heavy-tail diagnostic: the Hill estimator
  over the top-k order statistics, selected by an ordered limit
  (bounded k+1 rows); each log-excess term is an e8 integer
  (kaplan-meier pattern) so the mean is exact, with the implied
  Pareto alpha as the one closing double.
- rate_test_exposure compares purchase RATES (events per observed
  user-second, not per user) between variants: per-user exposure =
  integer-microsecond activity span from one groupBy, arm totals from
  a second, and the Poisson-rate z statistic closes over exact
  integers -- the correct test when exposure time differs by arm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Best decision-stump split of order value against the return label.
# ---------------------------------------------------------------------------
@register(
    "decision_stump_split",
    f"""
    WITH lab AS (
      SELECT {_CENTS} AS v,
             CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
      FROM orders o
      LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                 WHERE l_returnflag = 'R') r
        ON o.o_orderkey = r.l_orderkey
    ),
    spine AS (
      SELECT v, CAST(count(*) AS HUGEINT) AS c, CAST(sum(y) AS HUGEINT) AS k
      FROM lab GROUP BY v
    ),
    cum AS (
      SELECT v,
             sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
             sum(k) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kl
      FROM spine
    ),
    tot AS (SELECT CAST(sum(c) AS HUGEINT) AS n, CAST(sum(k) AS HUGEINT) AS kk
            FROM spine),
    scored AS (
      SELECT c.v,
             CAST(c.nl AS BIGINT) AS n_left, CAST(c.kl AS BIGINT) AS k_left,
             CAST(t.n - c.nl AS BIGINT) AS n_right,
             CAST(t.kk - c.kl AS BIGINT) AS k_right,
             CAST(round(1000000000000.0 * (
               (CAST(c.nl AS DOUBLE) / t.n)
                 * (1 - (CAST(c.kl AS DOUBLE) / c.nl)
                         * (CAST(c.kl AS DOUBLE) / c.nl)
                     - ((CAST(c.nl - c.kl AS DOUBLE)) / c.nl)
                         * ((CAST(c.nl - c.kl AS DOUBLE)) / c.nl))
               + (CAST(t.n - c.nl AS DOUBLE) / t.n)
                 * (1 - (CAST(t.kk - c.kl AS DOUBLE) / (t.n - c.nl))
                         * (CAST(t.kk - c.kl AS DOUBLE) / (t.n - c.nl))
                     - (CAST((t.n - c.nl) - (t.kk - c.kl) AS DOUBLE)
                        / (t.n - c.nl))
                         * (CAST((t.n - c.nl) - (t.kk - c.kl) AS DOUBLE)
                            / (t.n - c.nl)))), 0) AS BIGINT) AS gini_e12
      FROM cum c CROSS JOIN tot t
      WHERE c.nl < t.n
    )
    SELECT v AS split_cents, n_left, k_left, n_right, k_right, gini_e12
    FROM scored
    ORDER BY gini_e12, v
    LIMIT 1
    """,
    tags=("ml", "tree", "split-search"),
)
def q_decision_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One cumulative pass over the distinct-cent spine scores EVERY
    candidate threshold's weighted Gini impurity (exact counts -> one
    deterministic double -> e12 integer); the best split is an
    ordered-limit argmin with the value as tiebreak. This is the
    histogram/spine split search every distributed GBDT runs per
    feature per node."""
    li_r = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lab = o.join(li_r, o.o_orderkey == li_r.l_orderkey, "left").select(
        F.expr(_CENTS).alias("v"),
        F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
    )
    spine = lab.groupBy("v").agg(
        F.count(F.lit(1)).cast(_DEC).alias("c"),
        F.sum("y").cast(_DEC).alias("k"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # the distinct-cent spine of o_totalprice is ~O(rows): inclusive
    # cumulative (count, positive) pairs via the two-level rank plan.
    # The rank plan reads the spine 3x (cuts, assignment, join-back)
    # and `tot` a 4th time -- persisting the spine keeps the upstream
    # orders x distinct(R-lineitem) join to ONE computation (r6 fix for
    # the r5 bench regression: 3.4 s -> ~1.6 s at sf0.1).
    cum = with_global_rank(
        spine, "v", [F.col("v")], prefix_sum={"nl": "c", "kl": "k"}, bucket_bits=16
    ).select("v", F.col("nl").cast(_DEC).alias("nl"), F.col("kl").cast(_DEC).alias("kl"))
    tot = spine.agg(
        F.sum("c").cast(_DEC).alias("n"), F.sum("k").cast(_DEC).alias("kk")
    )
    j = cum.crossJoin(F.broadcast(tot)).where(F.col("nl") < F.col("n"))
    nl, kl = F.col("nl").cast("double"), F.col("kl").cast("double")
    n, kk = F.col("n").cast("double"), F.col("kk").cast("double")
    nr = (F.col("n") - F.col("nl")).cast("double")
    kr = (F.col("kk") - F.col("kl")).cast("double")
    gini = (nl / n) * (
        1 - (kl / nl) * (kl / nl) - ((F.col("nl") - F.col("kl")).cast("double") / nl)
        * ((F.col("nl") - F.col("kl")).cast("double") / nl)
    ) + (nr / n) * (
        1
        - (kr / nr) * (kr / nr)
        - (
            ((F.col("n") - F.col("nl")) - (F.col("kk") - F.col("kl"))).cast("double")
            / nr
        )
        * (
            ((F.col("n") - F.col("nl")) - (F.col("kk") - F.col("kl"))).cast("double")
            / nr
        )
    )
    scored = j.select(
        F.col("v").alias("split_cents"),
        F.col("nl").cast("bigint").alias("n_left"),
        F.col("kl").cast("bigint").alias("k_left"),
        (F.col("n") - F.col("nl")).cast("bigint").alias("n_right"),
        (F.col("kk") - F.col("kl")).cast("bigint").alias("k_right"),
        F.round(F.lit(1000000000000.0) * gini, 0).cast("bigint").alias("gini_e12"),
    )
    return scored.orderBy("gini_e12", "split_cents").limit(1)


# ---------------------------------------------------------------------------
# Hill tail-index estimator over the top-k order values.
# ---------------------------------------------------------------------------
_HILL_K = 100


@register(
    "hill_tail_index",
    f"""
    WITH topv AS (
      SELECT {_CENTS} AS v
      FROM orders ORDER BY {_CENTS} DESC, o_orderkey LIMIT {_HILL_K + 1}
    ),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v DESC) AS rn FROM topv
    ),
    ref AS (SELECT v AS x_ref FROM ranked WHERE rn = {_HILL_K + 1}),
    terms AS (
      SELECT CAST(round(100000000.0
               * ln(CAST(r.v AS DOUBLE) / ref.x_ref), 0) AS BIGINT) AS t_e8
      FROM ranked r CROSS JOIN ref WHERE r.rn <= {_HILL_K}
    )
    SELECT CAST({_HILL_K} AS BIGINT) AS k,
           (SELECT CAST(x_ref AS BIGINT) FROM ref) AS x_ref_cents,
           CAST(sum(t_e8) // {_HILL_K} AS BIGINT) AS hill_e8,
           round({_HILL_K} * 100000000.0 / sum(t_e8), 6) AS alpha_hat
    FROM terms
    """,
    tags=("stats", "extreme-value", "tail"),
)
def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator: mean log-excess of the top-100 order values over
    the 101st (ordered limit -> bounded rows; ties broken by orderkey
    in the top-k pick, by value in the rank). Each term is an e8
    integer, the mean is an exact floor division, and the implied
    Pareto alpha = k/sum closes in one double."""
    orders = read_table(spark, sf_dir, "orders").select(
        F.expr(_CENTS).alias("v"), "o_orderkey"
    )
    topv = orders.orderBy(F.col("v").desc(), "o_orderkey").limit(_HILL_K + 1)
    ranked = topv.select(
        "v", F.row_number().over(Window.orderBy(F.col("v").desc())).alias("rn")
    )
    ref = ranked.where(F.col("rn") == _HILL_K + 1).select(
        F.col("v").alias("x_ref")
    )
    terms = (
        ranked.where(F.col("rn") <= _HILL_K)
        .crossJoin(F.broadcast(ref))
        .select(
            F.round(
                F.lit(100000000.0)
                * F.log(F.col("v").cast("double") / F.col("x_ref")),
                0,
            )
            .cast("bigint")
            .alias("t_e8"),
            "x_ref",
        )
    )
    return terms.groupBy("x_ref").agg(
        F.lit(_HILL_K).cast("bigint").alias("k"),
        F.expr(f"CAST(sum(t_e8) DIV {_HILL_K} AS BIGINT)").alias("hill_e8"),
        F.round(F.lit(_HILL_K * 100000000.0) / F.sum("t_e8"), 6).alias("alpha_hat"),
    ).select(
        "k", F.col("x_ref").cast("bigint").alias("x_ref_cents"), "hill_e8", "alpha_hat"
    )


# ---------------------------------------------------------------------------
# Exposure-adjusted purchase-rate test between user-parity variants.
# ---------------------------------------------------------------------------
@register(
    "rate_test_exposure",
    """
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
             CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS span_us,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT variant, CAST(sum(k) AS BIGINT) AS kk,
             CAST(sum(span_us) AS BIGINT) AS t_us
      FROM u WHERE span_us > 0 GROUP BY variant
    ),
    wide AS (
      SELECT max(CASE WHEN variant = 0 THEN kk END) AS k_a,
             max(CASE WHEN variant = 0 THEN t_us END) AS t_a,
             max(CASE WHEN variant = 1 THEN kk END) AS k_b,
             max(CASE WHEN variant = 1 THEN t_us END) AS t_b
      FROM arms
    )
    SELECT k_a, t_a, k_b, t_b,
           round(1.0e12 * k_a / t_a, 6) AS rate_a_per_megasec,
           round(1.0e12 * k_b / t_b, 6) AS rate_b_per_megasec,
           CASE WHEN k_a = 0 AND k_b = 0 THEN NULL
                ELSE round((1.0e12 * k_a / t_a - 1.0e12 * k_b / t_b)
                  / sqrt(1.0e24 * k_a / (CAST(t_a AS DOUBLE) * t_a)
                         + 1.0e24 * k_b / (CAST(t_b AS DOUBLE) * t_b)), 6)
           END AS z_score
    FROM wide
    """,
    tags=("stats", "ab-test", "poisson"),
)
def q_rate_test_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-rate comparison with unequal exposure: per-user activity
    span in integer microseconds, arm totals (K, T), rates per
    megasecond, z = (r_a - r_b)/sqrt(K_a/T_a^2 + K_b/T_b^2). Exact
    integers into one double expression, identical operation order in
    both engines."""
    ev = read_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
        .cast("bigint")
        .alias("span_us"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    ).withColumn("variant", (F.col("user_id") % 2).cast("integer"))
    arms = (
        u.where(F.col("span_us") > 0)
        .groupBy("variant")
        .agg(
            F.sum("k").cast("bigint").alias("kk"),
            F.sum("span_us").cast("bigint").alias("t_us"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("kk"))).alias("k_a"),
        F.max(F.when(F.col("variant") == 0, F.col("t_us"))).alias("t_a"),
        F.max(F.when(F.col("variant") == 1, F.col("kk"))).alias("k_b"),
        F.max(F.when(F.col("variant") == 1, F.col("t_us"))).alias("t_b"),
    )
    ra = F.lit(1.0e12) * F.col("k_a") / F.col("t_a")
    rb = F.lit(1.0e12) * F.col("k_b") / F.col("t_b")
    se = F.sqrt(
        F.lit(1.0e24) * F.col("k_a") / (F.col("t_a").cast("double") * F.col("t_a"))
        + F.lit(1.0e24) * F.col("k_b") / (F.col("t_b").cast("double") * F.col("t_b"))
    )
    return wide.select(
        "k_a",
        "t_a",
        "k_b",
        "t_b",
        F.round(ra, 6).alias("rate_a_per_megasec"),
        F.round(rb, 6).alias("rate_b_per_megasec"),
        F.when((F.col("k_a") == 0) & (F.col("k_b") == 0), F.lit(None).cast("double"))
        .otherwise(F.round((ra - rb) / se, 6))
        .alias("z_score"),
    )
