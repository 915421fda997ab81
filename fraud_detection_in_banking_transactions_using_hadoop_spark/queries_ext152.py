"""Extension batch 152 (round 6): L-moments (the robust alternative to
ordinary moments: linear in the data so a single outlier cannot
explode them -- Hosking 1990) computed EXACTLY via the hockey-stick
binomial identity on the rank spine, the GEV distribution fitted from
the L-moments of weekly revenue maxima (generalizing
gumbel_block_maxima: the shape kappa decides Weibull/Gumbel/Frechet
tails), and Kadane's maximum-subarray as prefix-sum identities (the
best contiguous above-average revenue streak).

Cross-engine discipline:
- L-moment weighted sums need sum of C(i-1,k) * x_(i) over ranks with
  TIES: for a value with count c ending at cumulative cc, the rank-
  weight total is the hockey-stick difference C(cc,k+1) - C(cc-c,k+1)
  -- an exact integer, so B0..B3 accumulate in DECIMAL(38,0) and the
  lambda/tau ratios are single double expressions.
- GEV: Hosking's kappa approximation from t3, Gamma(1+kappa) via the
  shared A&S 6.1.36 polynomial (|err| < 3e-7; the kappa < 0 branch
  uses Gamma(1+k) = Gamma(2+k)/(1+k) to stay on [0,1]).
- Kadane: the n-scaled deviations u = n*x - S make the best-streak
  sum an exact integer (prefix sums minus exclusive running min);
  only the final dollars conversion divides.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

# A&S 6.1.36: Gamma(1+x) on [0,1], |err| <= 3e-7
_G_COEF = (
    -0.577191652, 0.988205891, -0.897056937, 0.918206857,
    -0.756704078, 0.482199394, -0.193527818, 0.035868343,
)


def _gamma1p_unit(x: str) -> str:
    """Gamma(1+x) polynomial text for x in [0, 1]."""
    expr = f"{_G_COEF[-1]!r}"
    for c in reversed(_G_COEF[:-1]):
        expr = f"({expr} * ({x}) + {c!r})"
    return f"(1.0 + {expr} * ({x}))"


def _gamma1p(x: str) -> str:
    """Gamma(1+x) for x in (-0.5, 1]: negative branch via
    Gamma(1+x) = Gamma(2+x)/(1+x)."""
    pos = _gamma1p_unit(x)
    neg = f"({_gamma1p_unit(f'1.0 + ({x})')} / (1.0 + ({x})))"
    return f"(CASE WHEN ({x}) >= 0.0 THEN {pos} ELSE {neg} END)"


# hockey-stick rank-weight sums over a (v, c, cc) spine:
# B_k = sum_v v * (C(cc, k+1) - C(cc-c, k+1))
_BSUMS_SQL = """
    wide AS (
      SELECT CAST(v AS HUGEINT) AS v, CAST(cc AS HUGEINT) AS cc,
             CAST(cc - c AS HUGEINT) AS cp, c
      FROM ranked),
    bsums AS (
      SELECT
        CAST(sum(v * c) AS HUGEINT) AS b0n,
        CAST(sum(v * (cc * (cc - 1) // 2 - cp * (cp - 1) // 2))
             AS HUGEINT) AS b1n,
        CAST(sum(v * (cc * (cc - 1) * (cc - 2) // 6
                - cp * (cp - 1) * (cp - 2) // 6)) AS HUGEINT) AS b2n,
        CAST(sum(v * (cc * (cc - 1) * (cc - 2) * (cc - 3) // 24
                - cp * (cp - 1) * (cp - 2) * (cp - 3) // 24))
             AS HUGEINT) AS b3n,
        CAST(sum(c) AS HUGEINT) AS n
      FROM wide)
"""


def _bsums_spark(ranked: DataFrame) -> DataFrame:
    wide = ranked.select(
        F.col("v").cast(_DEC).alias("vv"),
        F.col("cc").cast(_DEC).alias("cc"),
        (F.col("cc") - F.col("c")).cast(_DEC).alias("cp"),
        "c",
    )
    hs1 = F.expr("cc * (cc - 1) DIV 2 - cp * (cp - 1) DIV 2").cast(_DEC)
    hs2 = F.expr(
        "cc * (cc - 1) * (cc - 2) DIV 6 - cp * (cp - 1) * (cp - 2) DIV 6"
    ).cast(_DEC)
    hs3 = F.expr(
        "cc * (cc - 1) * (cc - 2) * (cc - 3) DIV 24"
        " - cp * (cp - 1) * (cp - 2) * (cp - 3) DIV 24"
    ).cast(_DEC)
    return wide.agg(
        F.sum(F.col("vv") * F.col("c")).cast(_DEC).alias("b0n"),
        F.sum(F.col("vv") * hs1).cast(_DEC).alias("b1n"),
        F.sum(F.col("vv") * hs2).cast(_DEC).alias("b2n"),
        F.sum(F.col("vv") * hs3).cast(_DEC).alias("b3n"),
        F.sum("c").cast(_DEC).alias("n"),
    )


_LRATIOS_SQL = """
    lm AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(b0n AS DOUBLE) / CAST(n AS DOUBLE) AS b0,
             CAST(b1n AS DOUBLE)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS b1,
             2.0 * CAST(b2n AS DOUBLE)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                  * (CAST(n AS DOUBLE) - 2.0)) AS b2,
             6.0 * CAST(b3n AS DOUBLE)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                  * (CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0))
               AS b3
      FROM bsums)
"""


def _lratios_spark(bs: DataFrame) -> DataFrame:
    nd = F.col("n").cast("double")
    return bs.select(
        F.col("n").cast("bigint").alias("n"),
        (F.col("b0n").cast("double") / nd).alias("b0"),
        (F.col("b1n").cast("double") / (nd * (nd - 1.0))).alias("b1"),
        (
            2.0
            * F.col("b2n").cast("double")
            / (nd * (nd - 1.0) * (nd - 2.0))
        ).alias("b2"),
        (
            6.0
            * F.col("b3n").cast("double")
            / (nd * (nd - 1.0) * (nd - 2.0) * (nd - 3.0))
        ).alias("b3"),
    )


@register(
    "l_moments_acctbal",
    f"""
    WITH spine AS (
      SELECT CAST(round(c_acctbal * 100, 0) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM customer GROUP BY 1),
    ranked AS (
      SELECT v, c, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    {_BSUMS_SQL},
    {_LRATIOS_SQL}
    SELECT n AS n_customers,
           round(b0 / 100.0, 4) AS l1_dollars,
           round((2.0 * b1 - b0) / 100.0, 4) AS l2_dollars,
           round((6.0 * b2 - 6.0 * b1 + b0) / (2.0 * b1 - b0), 6) + 0.0
             AS l_skew_t3,
           round((20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0)
                 / (2.0 * b1 - b0), 6) + 0.0 AS l_kurt_t4,
           round((2.0 * b1 - b0) / b0, 6) + 0.0 AS l_cv
    FROM lm
    """,
    tags=("stats", "robust", "l-moments"),
)
def q_l_moments_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First four L-moments of customer account balances: l1 (mean),
    l2 (L-scale: half Gini mean difference), t3 (L-skewness), t4
    (L-kurtosis) and L-CV -- the order-statistics moments that stay
    finite and stable under fat tails where ordinary skew/kurtosis
    explode. The probability-weighted sums B_k = sum C(i-1,k) x_(i)
    fold the tie-safe hockey-stick identity C(cc,k+1) - C(cc-c,k+1)
    over the cumulative rank spine -- exact integers end to end, one
    double ratio per statistic."""
    cust = read_table(spark, sf_dir, "customer")
    spine = (
        cust.select(
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ranked = with_global_rank(
        spine, "v", [F.col("v")], prefix_sum={"cc": "c"}
    ).select("v", "c", "cc")
    lm = _lratios_spark(_bsums_spark(ranked))
    l2 = 2.0 * F.col("b1") - F.col("b0")
    return lm.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("b0") / 100.0, 4).alias("l1_dollars"),
        F.round(l2 / 100.0, 4).alias("l2_dollars"),
        (
            F.round(
                (6.0 * F.col("b2") - 6.0 * F.col("b1") + F.col("b0")) / l2, 6
            )
            + F.lit(0.0)
        ).alias("l_skew_t3"),
        (
            F.round(
                (
                    20.0 * F.col("b3")
                    - 30.0 * F.col("b2")
                    + 12.0 * F.col("b1")
                    - F.col("b0")
                )
                / l2,
                6,
            )
            + F.lit(0.0)
        ).alias("l_kurt_t4"),
        (F.round(l2 / F.col("b0"), 6) + F.lit(0.0)).alias("l_cv"),
    )


_GEV_T3 = "((6.0 * b2 - 6.0 * b1 + b0) / (2.0 * b1 - b0))"
_GEV_C = f"(2.0 / (3.0 + {_GEV_T3}) - 0.6309297535714574)"  # ln2/ln3
_GEV_K = f"(7.8590 * {_GEV_C} + 2.9554 * {_GEV_C} * {_GEV_C})"


@register(
    "gev_lmoments_fit",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS dollars
      FROM orders GROUP BY o_orderdate),
    blocks AS (
      SELECT date_trunc('week', d) AS w, CAST(max(dollars) AS BIGINT) AS v
      FROM daily GROUP BY 1),
    spine AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c FROM blocks GROUP BY v),
    ranked AS (
      SELECT v, c, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    {_BSUMS_SQL},
    {_LRATIOS_SQL},
    fit AS (
      SELECT n, b0, b1, b2,
             {_GEV_K} AS kappa,
             (2.0 * b1 - b0) * {_GEV_K}
               / ((1.0 - pow(2.0, -{_GEV_K})) * {_gamma1p(_GEV_K)}) AS sigma
      FROM lm)
    SELECT CAST(n AS BIGINT) AS n_weeks,
           round(kappa, 6) + 0.0 AS gev_shape_kappa,
           round(sigma, 4) AS gev_scale_dollars,
           round(b0 - sigma * (1.0 - {_gamma1p("kappa")}) / kappa, 4)
             AS gev_location_dollars,
           round(b0 - sigma * (1.0 - {_gamma1p("kappa")}) / kappa
                 + sigma / kappa
                   * (pow(-ln(1.0 - 1.0 / 52.0), -kappa) - 1.0), 4)
             AS return_level_52wk_dollars
    FROM fit
    """,
    tags=("stats", "extreme-value", "l-moments"),
)
def q_gev_lmoments_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEV fitted to weekly maxima of daily revenue by the Hosking
    L-moment method: kappa from the L-skewness via the standard
    two-term approximation, sigma = l2*k/((1-2^-k)Gamma(1+k)), mu =
    l1 - sigma(1-Gamma(1+k))/k, and the 52-week return level mu +
    sigma/k((-ln(1-1/52))^-k - 1). kappa < 0 means a heavy (Frechet)
    upper tail -- the regime where gumbel_block_maxima understates
    extremes. Gamma(1+k) is the shared A&S polynomial; the L-moment
    inputs are exact hockey-stick integers."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("dollars")
    )
    blocks = daily.groupBy(F.date_trunc("week", F.col("d")).alias("w")).agg(
        F.max("dollars").cast("bigint").alias("v")
    )
    spine = blocks.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = spine.select("v", "c", F.sum("c").over(w).alias("cc"))
    lm = _lratios_spark(_bsums_spark(ranked))
    fit = lm.select(
        "n",
        "b0",
        F.expr(_GEV_K).alias("kappa"),
        (
            (2.0 * F.col("b1") - F.col("b0"))
            * F.expr(_GEV_K)
            / (
                (1.0 - F.pow(F.lit(2.0), -F.expr(_GEV_K)))
                * F.expr(_gamma1p(_GEV_K))
            )
        ).alias("sigma"),
    )
    mu = F.col("b0") - F.col("sigma") * (
        1.0 - F.expr(_gamma1p("kappa"))
    ) / F.col("kappa")
    return fit.select(
        F.col("n").cast("bigint").alias("n_weeks"),
        (F.round(F.col("kappa"), 6) + F.lit(0.0)).alias("gev_shape_kappa"),
        F.round(F.col("sigma"), 4).alias("gev_scale_dollars"),
        F.round(mu, 4).alias("gev_location_dollars"),
        F.round(
            mu
            + F.col("sigma")
            / F.col("kappa")
            * (
                F.pow(F.lit(-math.log(1.0 - 1.0 / 52.0)), -F.col("kappa"))
                - 1.0
            ),
            4,
        ).alias("return_level_52wk_dollars"),
    )


@register(
    "kadane_best_streak",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderdate),
    tot AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(cents) AS HUGEINT) AS s
      FROM daily),
    pre AS (
      SELECT d, sum(CAST(cents AS HUGEINT) * t.n - t.s) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
      FROM daily CROSS JOIN tot t),
    scored AS (
      SELECT d, rn, p,
             coalesce(min(p) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS minp
      FROM pre),
    best AS (
      SELECT rn, p - minp AS gain, minp
      FROM scored
      ORDER BY p - minp DESC, rn LIMIT 1),
    started AS (
      SELECT b.rn, b.gain,
             coalesce(min(s.rn) + 1, 1) AS start_rn
      FROM best b LEFT JOIN pre s
        ON s.rn < b.rn AND s.p = b.minp
      GROUP BY b.rn, b.gain)
    SELECT CAST(b.rn - b.start_rn + 1 AS BIGINT) AS streak_days,
           round(CAST(b.gain AS DOUBLE) / CAST(t.n AS DOUBLE) / 100.0, 2)
             AS excess_revenue_dollars
    FROM started b CROSS JOIN tot t
    """,
    tags=("timeseries", "algorithm"),
)
def q_kadane_best_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kadane's maximum-subarray on daily revenue deviations: the
    contiguous run of days whose total revenue most exceeds the
    overall daily average. Deviations are carried n-scaled (u = n*x -
    S, exact integers), prefix sums P_t minus the EXCLUSIVE running
    minimum give the best gain ending at each day, and the deterministic
    argmax/argmin pair recovers the streak bounds. One pass, two
    windows over the calendar spine -- the O(n) algorithm, relationally."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("cents").cast(_DEC).alias("s"),
    )
    wd = Window.orderBy("d")
    pre = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        F.sum(F.col("cents").cast(_DEC) * F.col("n") - F.col("s"))
        .over(wd.rowsBetween(Window.unboundedPreceding, 0))
        .alias("p"),
        F.row_number().over(wd).cast("bigint").alias("rn"),
    )
    excl = wd.rowsBetween(Window.unboundedPreceding, -1)
    scored = pre.select(
        "d",
        "rn",
        "p",
        F.coalesce(F.min("p").over(excl), F.lit(0).cast(_DEC)).alias("minp"),
    )
    best = (
        scored.select(
            "rn",
            (F.col("p") - F.col("minp")).alias("gain"),
            "minp",
        )
        .orderBy(F.col("gain").desc(), "rn")
        .limit(1)
        .select(
            F.col("rn").alias("rn_b"),
            "gain",
            F.col("minp").alias("minp_b"),
        )
    )
    started = (
        pre.join(
            F.broadcast(best),
            (F.col("rn") < F.col("rn_b")) & (F.col("p") == F.col("minp_b")),
            "right",
        )
        .groupBy("rn_b", "gain")
        .agg(F.coalesce(F.min("rn") + 1, F.lit(1)).alias("start_rn"))
    )
    return started.crossJoin(F.broadcast(tot)).select(
        (F.col("rn_b") - F.col("start_rn") + 1).cast("bigint").alias(
            "streak_days"
        ),
        F.round(
            F.col("gain").cast("double") / F.col("n").cast("double") / 100.0, 2
        ).alias("excess_revenue_dollars"),
    )
