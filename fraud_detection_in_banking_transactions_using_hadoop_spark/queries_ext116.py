"""Extension batch 116 (round 6): rank-based two-sample tests on the
distinct-value spine machinery -- Anderson-Darling (k=2, Scholz-
Stephens discrete version), Brunner-Munzel (heteroscedastic rank
test), and Cucconi (joint location-scale).

Scale notes (the 100 TB story, shared): every statistic is an exact
aggregate over the distinct-CENT spine of c_acctbal -- one groupBy to
the spine, one with_global_rank prefix pass for the pooled/within-arm
cumulative counts, and a broadcast of the 1-row totals. Midranks,
deviation terms, and squared-rank sums are all derived per SPINE ROW
(every observation at the same value shares them), weighted by the
spine count -- no per-observation shuffle ever happens. Per-term
doubles are built from exact integers with engine-identical operation
order and e6-rounded before the order-free integer sum (the CLAUDE.md
float-sum rule).

Null-moment caveat (documented, standard practice): Brunner-Munzel
uses midranks natively; the Cucconi standardization uses the no-tie
null moments with midrank sums, and the A-D version is Scholz-
Stephens' eq. (3) for the right-continuous ECDF (their "not midrank-
adjusted" discrete variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


def _spine_sql(seg1: str, seg0: str) -> str:
    """Shared CTE text: cent spine with per-arm counts + inclusive
    prefix sums + totals, for customer segments seg1 (arm 1) / seg0."""
    return f"""
    vals AS (
      SELECT CASE WHEN c_mktsegment = '{seg1}' THEN 1 ELSE 0 END AS arm,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS v
      FROM customer WHERE c_mktsegment IN ('{seg1}', '{seg0}')),
    spine AS (
      SELECT v, CAST(sum(arm) AS BIGINT) AS c1,
             CAST(count(*) - sum(arm) AS BIGINT) AS c0
      FROM vals GROUP BY v),
    pre AS (
      SELECT v, c1, c0,
             sum(c1) OVER w AS cc1, sum(c0) OVER w AS cc0
      FROM spine
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0,
             CAST(sum(c1) + sum(c0) AS BIGINT) AS n
      FROM spine)"""


def _spine_spark(spark: SparkSession, sf_dir: str, seg1: str, seg0: str):
    """Spark twin of _spine_sql: (pre, tot) with identical columns."""
    cust = read_table(spark, sf_dir, "customer")
    vals = cust.where(F.col("c_mktsegment").isin(seg1, seg0)).select(
        F.when(F.col("c_mktsegment") == seg1, 1).otherwise(0).alias("arm"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v"),
    )
    spine = vals.groupBy("v").agg(
        F.sum("arm").cast("bigint").alias("c1"),
        (F.count(F.lit(1)) - F.sum("arm")).cast("bigint").alias("c0"),
    )
    pre = with_global_rank(
        spine, "v", [F.col("v")], prefix_sum={"cc1": "c1", "cc0": "c0"}
    ).select("v", "c1", "c0", "cc1", "cc0")
    tot = spine.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c0").cast("bigint").alias("n0"),
        (F.sum("c1") + F.sum("c0")).cast("bigint").alias("n"),
    )
    return pre, tot


# ---------------------------------------------------------------------------
# Two-sample Anderson-Darling (Scholz-Stephens 1987, eq. 3 discrete).
# ---------------------------------------------------------------------------
@register(
    "anderson_darling_2s",
    f"""
    WITH {_spine_sql("AUTOMOBILE", "HOUSEHOLD")},
    terms AS (
      SELECT CAST(round(1000000.0 *
               CAST((c1 + c0) * (t.n * cc1 - t.n1 * (cc1 + cc0))
                    * (t.n * cc1 - t.n1 * (cc1 + cc0)) AS DOUBLE)
               / CAST((cc1 + cc0) * (t.n - cc1 - cc0) AS DOUBLE), 0)
             AS HUGEINT) AS t1_e6,
             CAST(round(1000000.0 *
               CAST((c1 + c0) * (t.n * cc0 - t.n0 * (cc1 + cc0))
                    * (t.n * cc0 - t.n0 * (cc1 + cc0)) AS DOUBLE)
               / CAST((cc1 + cc0) * (t.n - cc1 - cc0) AS DOUBLE), 0)
             AS HUGEINT) AS t0_e6
      FROM pre CROSS JOIN tot t
      WHERE cc1 + cc0 < t.n)
    SELECT t.n1 AS n_auto, t.n0 AS n_house,
           CAST(count(*) + 1 AS BIGINT) AS n_distinct_pooled,
           round((CAST(sum(t1_e6) AS DOUBLE) / 1000000.0 / t.n1
                  + CAST(sum(t0_e6) AS DOUBLE) / 1000000.0 / t.n0)
                 / t.n, 6) AS a2_stat
    FROM terms CROSS JOIN tot t
    GROUP BY t.n1, t.n0, t.n
    """,
    tags=("stats", "distribution", "exact-arith"),
)
def q_anderson_darling_2s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling between AUTOMOBILE and HOUSEHOLD
    account balances: A2 = (1/N) * sum_i (1/n_i) * sum_j l_j *
    (N*M_ij - n_i*B_j)^2 / (B_j*(N-B_j)) over distinct pooled values
    with B_j < N (Scholz & Stephens 1987 eq. 3). Every numerator and
    denominator is an exact integer off the spine prefix; the one
    division per term is e6-rounded before the order-free sum. A-D
    weights the CDF gap by 1/(F(1-F)), so it out-powers KS in the
    tails -- the distribution screen you want for heavy-tailed money
    columns."""
    pre, tot = _spine_spark(spark, sf_dir, "AUTOMOBILE", "HOUSEHOLD")
    b = F.col("cc1") + F.col("cc0")
    l = F.col("c1") + F.col("c0")
    den = (b * (F.col("n") - b)).cast("double")

    def term(cc, nn):
        num = F.col("n") * cc - nn * b
        return F.round(
            F.lit(1000000.0) * (l * num * num).cast("double") / den, 0
        ).cast(_DEC)

    terms = (
        pre.crossJoin(F.broadcast(tot))
        .where(b < F.col("n"))
        .select(
            term(F.col("cc1"), F.col("n1")).alias("t1_e6"),
            term(F.col("cc0"), F.col("n0")).alias("t0_e6"),
            "n1", "n0", "n",
        )
    )
    return terms.groupBy("n1", "n0", "n").agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_distinct_pooled"),
        F.round(
            (
                F.sum("t1_e6").cast("double") / 1000000.0 / F.col("n1")
                + F.sum("t0_e6").cast("double") / 1000000.0 / F.col("n0")
            )
            / F.col("n"),
            6,
        ).alias("a2_stat"),
    ).select(
        F.col("n1").alias("n_auto"),
        F.col("n0").alias("n_house"),
        "n_distinct_pooled",
        "a2_stat",
    )


# ---------------------------------------------------------------------------
# Brunner-Munzel heteroscedastic rank test (scipy W formulation).
# ---------------------------------------------------------------------------
@register(
    "brunner_munzel",
    f"""
    WITH {_spine_sql("FURNITURE", "MACHINERY")},
    mid AS (
      SELECT c1, c0,
             CAST(2 * (cc1 + cc0) - (c1 + c0) + 1 AS DOUBLE) / 2 AS r,
             CAST(2 * cc1 - c1 + 1 AS DOUBLE) / 2 AS r1,
             CAST(2 * cc0 - c0 + 1 AS DOUBLE) / 2 AS r0
      FROM pre),
    sums AS (
      SELECT CAST(sum(c1 * CAST(2 * r AS BIGINT)) AS BIGINT) AS s2r1,
             CAST(sum(c0 * CAST(2 * r AS BIGINT)) AS BIGINT) AS s2r0
      FROM mid),
    means AS (
      SELECT CAST(s.s2r1 AS DOUBLE) / (2 * t.n1) AS rbar1,
             CAST(s.s2r0 AS DOUBLE) / (2 * t.n0) AS rbar0,
             t.n1, t.n0, t.n
      FROM sums s CROSS JOIN tot t),
    devs AS (
      SELECT CAST(sum(c1 * CAST(round(1000000.0
               * (r - r1 - m.rbar1 + (m.n1 + 1) / 2.0)
               * (r - r1 - m.rbar1 + (m.n1 + 1) / 2.0), 0) AS HUGEINT))
             AS HUGEINT) AS ss1_e6,
             CAST(sum(c0 * CAST(round(1000000.0
               * (r - r0 - m.rbar0 + (m.n0 + 1) / 2.0)
               * (r - r0 - m.rbar0 + (m.n0 + 1) / 2.0), 0) AS HUGEINT))
             AS HUGEINT) AS ss0_e6
      FROM mid CROSS JOIN means m)
    SELECT m.n1 AS n_furniture, m.n0 AS n_machinery,
           round((m.rbar1 - (m.n1 + 1) / 2.0) / m.n0, 6) AS p_hat,
           round(CAST(m.n1 AS DOUBLE) * m.n0 * (m.rbar1 - m.rbar0) / m.n
                 / sqrt(CAST(m.n1 AS DOUBLE)
                        * (CAST(d.ss1_e6 AS DOUBLE) / 1000000.0 / (m.n1 - 1))
                        + CAST(m.n0 AS DOUBLE)
                        * (CAST(d.ss0_e6 AS DOUBLE) / 1000000.0 / (m.n0 - 1))),
                 6) AS w_stat
    FROM devs d CROSS JOIN means m
    """,
    tags=("stats", "nonparametric", "exact-arith"),
)
def q_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel test (FURNITURE vs MACHINERY balances): the
    rank-based Behrens-Fisher test that stays valid when the two arms
    have different shapes/variances -- unlike Mann-Whitney, whose null
    assumes equal distributions. p_hat = P(X0 < X1) + P(=)/2 from the
    mean pooled midrank; W = n1*n0*(rbar1-rbar0) / (N*sqrt(n1*S1^2 +
    n0*S0^2)) with S_i^2 the variance of (pooled - within) midrank
    deviations (scipy's W formulation). Midranks come per SPINE ROW
    from the same prefix pass; each squared deviation is an
    engine-identical double e6-rounded before the weighted integer
    sum."""
    pre, tot = _spine_spark(spark, sf_dir, "FURNITURE", "MACHINERY")
    l = F.col("c1") + F.col("c0")
    r = (2 * (F.col("cc1") + F.col("cc0")) - l + 1).cast("double") / 2
    r1 = (2 * F.col("cc1") - F.col("c1") + 1).cast("double") / 2
    r0 = (2 * F.col("cc0") - F.col("c0") + 1).cast("double") / 2
    mid = pre.select(
        "c1", "c0", r.alias("r"), r1.alias("r1"), r0.alias("r0")
    )
    sums = mid.agg(
        F.sum(F.col("c1") * (2 * F.col("r")).cast("bigint")).cast("bigint").alias("s2r1"),
        F.sum(F.col("c0") * (2 * F.col("r")).cast("bigint")).cast("bigint").alias("s2r0"),
    )
    means = sums.crossJoin(F.broadcast(tot)).select(
        (F.col("s2r1").cast("double") / (2 * F.col("n1"))).alias("rbar1"),
        (F.col("s2r0").cast("double") / (2 * F.col("n0"))).alias("rbar0"),
        "n1", "n0", "n",
    )

    def ss(c, rw, rbar, nn):
        dev = F.col("r") - rw - F.col(rbar) + (F.col(nn) + 1) / F.lit(2.0)
        return F.sum(
            c * F.round(F.lit(1000000.0) * dev * dev, 0).cast(_DEC)
        ).cast(_DEC)

    devs = mid.crossJoin(F.broadcast(means)).agg(
        ss(F.col("c1"), F.col("r1"), "rbar1", "n1").alias("ss1_e6"),
        ss(F.col("c0"), F.col("r0"), "rbar0", "n0").alias("ss0_e6"),
    )
    n1d, n0d = F.col("n1").cast("double"), F.col("n0").cast("double")
    s1sq = F.col("ss1_e6").cast("double") / 1000000.0 / (F.col("n1") - 1)
    s0sq = F.col("ss0_e6").cast("double") / 1000000.0 / (F.col("n0") - 1)
    return devs.crossJoin(F.broadcast(means)).select(
        F.col("n1").alias("n_furniture"),
        F.col("n0").alias("n_machinery"),
        F.round((F.col("rbar1") - (F.col("n1") + 1) / F.lit(2.0)) / F.col("n0"), 6).alias(
            "p_hat"
        ),
        F.round(
            n1d * F.col("n0") * (F.col("rbar1") - F.col("rbar0")) / F.col("n")
            / F.sqrt(n1d * s1sq + n0d * s0sq),
            6,
        ).alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# Cucconi joint location-scale test (midrank sums, no-tie null moments).
# ---------------------------------------------------------------------------
@register(
    "cucconi_location_scale",
    f"""
    WITH {_spine_sql("BUILDING", "AUTOMOBILE")},
    mid AS (
      SELECT c1, CAST(2 * (cc1 + cc0) - (c1 + c0) + 1 AS BIGINT) AS r2
      FROM pre),
    sums AS (
      SELECT CAST(sum(c1 * r2) AS BIGINT) AS s2,
             CAST(sum(c1 * r2 * r2) AS BIGINT) AS s4
      FROM mid),
    closed AS (
      SELECT t.n1 AS nb, t.n0 AS na, t.n,
             6 * s.s4 - 4 * t.n1 * (t.n + 1) * (2 * t.n + 1) AS u_num4,
             6 * (4 * t.n1 * (t.n + 1) * (t.n + 1)
                  - 4 * (t.n + 1) * s.s2 + s.s4)
               - 4 * t.n1 * (t.n + 1) * (2 * t.n + 1) AS v_num4,
             4 * sqrt(CAST(t.n0 AS DOUBLE) * t.n1 * (t.n + 1)
                      * (2 * t.n + 1) * (8 * t.n + 11) / 5.0) AS den4,
             2.0 * (CAST(t.n AS DOUBLE) * t.n - 4)
               / ((2 * t.n + 1) * (8.0 * t.n + 11)) - 1 AS rho
      FROM sums s CROSS JOIN tot t)
    SELECT nb AS n_building, na AS n_auto,
           round(u_num4 / den4, 6) AS u_star,
           round(v_num4 / den4, 6) AS v_star,
           round(((u_num4 / den4) * (u_num4 / den4)
                  + (v_num4 / den4) * (v_num4 / den4)
                  - 2 * rho * (u_num4 / den4) * (v_num4 / den4))
                 / (2 * (1 - rho * rho)), 6) AS c_stat
    FROM closed
    """,
    tags=("stats", "nonparametric", "location-scale"),
)
def q_cucconi_location_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi test (BUILDING vs AUTOMOBILE balances): the joint
    location-SCALE two-sample test -- U standardizes the sum of squared
    midranks of arm 1, V the sum of squared CONTRARY midranks
    (N+1-R), and C = (U^2 + V^2 - 2 rho U V) / (2(1-rho^2)) combines
    them with their exact null correlation rho(N). Both squared-rank
    sums reduce to the two exact integer spine sums S2 = sum c*(2R)
    and S4 = sum c*(2R)^2 (contrary squares expand through S2/S4), so
    the statistic closes over integers with one engine-identical
    sqrt. Detects shifts Mann-Whitney misses when the scale moves
    too."""
    pre, tot = _spine_spark(spark, sf_dir, "BUILDING", "AUTOMOBILE")
    l = F.col("c1") + F.col("c0")
    r2 = (2 * (F.col("cc1") + F.col("cc0")) - l + 1).cast("bigint")
    mid = pre.select("c1", r2.alias("r2"))
    sums = mid.agg(
        F.sum(F.col("c1") * F.col("r2")).cast("bigint").alias("s2"),
        F.sum(F.col("c1") * F.col("r2") * F.col("r2")).cast("bigint").alias("s4"),
    )
    t = sums.crossJoin(F.broadcast(tot))
    n1, n0, nn = F.col("n1"), F.col("n0"), F.col("n")
    u_num4 = 6 * F.col("s4") - 4 * n1 * (nn + 1) * (2 * nn + 1)
    # 4*sum((N+1-R)^2) expands through the two integer spine sums:
    # 4*n1*(N+1)^2 - 4*(N+1)*S2 + S4   (S2 = 2*sum R, S4 = 4*sum R^2)
    v4 = 4 * n1 * (nn + 1) * (nn + 1) - 4 * (nn + 1) * F.col("s2") + F.col("s4")
    v_num4 = 6 * v4 - 4 * n1 * (nn + 1) * (2 * nn + 1)
    den4 = 4 * F.sqrt(
        n0.cast("double") * n1 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / F.lit(5.0)
    )
    rho = (
        F.lit(2.0) * (nn.cast("double") * nn - 4)
        / ((2 * nn + 1) * (F.lit(8.0) * nn + 11))
        - 1
    )
    u = u_num4 / den4
    v = v_num4 / den4
    return t.select(
        n1.alias("n_building"),
        n0.alias("n_auto"),
        F.round(u, 6).alias("u_star"),
        F.round(v, 6).alias("v_star"),
        F.round((u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho)), 6).alias(
            "c_stat"
        ),
    )
