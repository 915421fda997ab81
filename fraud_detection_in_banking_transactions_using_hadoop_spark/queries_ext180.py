"""Extension batch 180 (round 6): the last classics in three families
this engine already covers deeply -- Taguchi's Cpm/Cpmk (capability
with a LOSS-FUNCTION denominator: deviation from the TARGET, not just
spread, so an on-spec-but-off-center process is penalized; completes
the Cpk / percentile-Cpk pair from ext179), the Grubbs test (THE
canonical small-sample outlier test -- its max-selection-aware
critical value at n = 25 sits at 2.822 sigma, far stricter than the
Thompson tau screen's 2.33 on the same nation totals, and the two
verdicts printed side by side are the single-pass-screen vs
formal-test distinction), and the Hoover index (the "Robin Hood"
share of total revenue that would have to move between customers to
equalize -- the last classic inequality index beside the Gini /
Atkinson / Palma / Theil family already shipped).

Cross-engine discipline: Taguchi's tau^2 folds as the exact integer
identity s2 - 2*T*s1 + n*T^2 with the integer median T off the rank
spine; Grubbs reuses Thompson's exact-moment |dev|/s with the
t_{0.001,23} literal; Hoover is the all-integer ratio
sum(max(n*x - S, 0)) / (n*S), emitted as an exact ppm BIGINT before
the rounded double."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
# upper-tail t quantile at p = alpha/(2n) = 0.05/50 = 0.001, df = 23
# (regularized-incomplete-beta bisection; published table: 3.485)
_T_0001_23 = 3.4849643749398123


@register(
    "taguchi_cpm",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    r AS (
      SELECT v, CAST(row_number() OVER (ORDER BY v, d) AS BIGINT) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily),
    q AS (
      SELECT max(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT) THEN v END)
               AS t,
             CAST(sum(v) AS HUGEINT) AS s1,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2,
             max(n) AS n
      FROM r),
    k AS (
      SELECT n, t, s1, s2,
             CAST(s2 - 2 * CAST(t AS HUGEINT) * s1
                  + CAST(n AS HUGEINT) * t * t AS HUGEINT) AS ssd_t,
             CAST(s1 AS DOUBLE) / n AS mu,
             0.5 * t AS lsl, 1.5 * t AS usl
      FROM q)
    SELECT n AS n_days,
           CAST(t AS BIGINT) AS target_dollars,
           round(CAST(t AS DOUBLE)
                 / (6.0 * sqrt(CAST(ssd_t AS DOUBLE) / n)), 4) AS cpm,
           round(least(usl - mu, mu - lsl)
                 / (3.0 * sqrt(CAST(ssd_t AS DOUBLE) / n)), 4) AS cpmk,
           round(least(usl - mu, mu - lsl)
                 / (3.0 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n), 4)
             AS cpk_normal,
           round(least(usl - mu, mu - lsl)
                 / (3.0 * sqrt(CAST(ssd_t AS DOUBLE) / n))
                 - least(usl - mu, mu - lsl)
                 / (3.0 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n), 4)
             + 0.0 AS cpmk_minus_cpk
    FROM k
    """,
    tags=("spc", "capability", "taguchi"),
)
def q_taguchi_cpm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taguchi capability of daily revenue against the median +-50%
    band with target T = median: Cpm = (USL - LSL)/(6 tau) and
    Cpmk = min(USL - mu, mu - LSL)/(3 tau) where tau^2 = E[(X - T)^2]
    = sigma^2 + (mu - T)^2 -- spread AND off-target shift in one
    denominator (the quadratic-loss view), vs the classical Cpk that
    sees spread only. tau^2 folds as the EXACT integer identity
    s2 - 2 T s1 + n T^2 with the integer median T off the rank spine;
    cpmk_minus_cpk <= 0 always, and its magnitude is the capability
    the mean-vs-median skew of this data costs under quadratic loss."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    r = daily.select(
        "v",
        F.row_number().over(Window.orderBy("v", "d")).cast("bigint").alias(
            "rk"
        ),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("n"),
    )
    q = r.agg(
        F.max(
            F.when(
                F.col("rk") == F.expr("CAST(ceil(0.5 * n) AS BIGINT)"),
                F.col("v"),
            )
        ).alias("t"),
        F.sum("v").cast(_DEC).alias("s1"),
        F.sum(F.col("v").cast(_DEC) * F.col("v")).cast(_DEC).alias("s2"),
        F.max("n").alias("n"),
    )
    k = q.select(
        "n",
        "t",
        "s1",
        "s2",
        (
            F.col("s2")
            - 2 * F.col("t").cast(_DEC) * F.col("s1")
            + F.col("n").cast(_DEC) * F.col("t") * F.col("t")
        )
        .cast(_DEC)
        .alias("ssd_t"),
        (F.col("s1").cast("double") / F.col("n")).alias("mu"),
        (0.5 * F.col("t")).alias("lsl"),
        (1.5 * F.col("t")).alias("usl"),
    )
    tau = F.sqrt(F.col("ssd_t").cast("double") / F.col("n"))
    sig = (
        F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
        )
        / F.col("n")
    )
    half = F.least(
        F.col("usl") - F.col("mu"), F.col("mu") - F.col("lsl")
    )
    return k.select(
        F.col("n").alias("n_days"),
        F.col("t").cast("bigint").alias("target_dollars"),
        F.round(F.col("t").cast("double") / (6.0 * tau), 4).alias("cpm"),
        F.round(half / (3.0 * tau), 4).alias("cpmk"),
        F.round(half / (3.0 * sig), 4).alias("cpk_normal"),
        (
            F.round(half / (3.0 * tau) - half / (3.0 * sig), 4)
            + F.lit(0.0)
        ).alias("cpmk_minus_cpk"),
    )


@register(
    "grubbs_test",
    f"""
    WITH nat AS (
      SELECT c.c_nationkey AS nk,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS HUGEINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS s1,
             CAST(sum(cents * cents) AS HUGEINT) AS s2
      FROM nat),
    dev AS (
      SELECT nt.nk, m.n,
             abs(CAST(nt.cents AS DOUBLE) - CAST(m.s1 AS DOUBLE) / m.n)
               / (sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE))
                  / (sqrt(CAST(m.n AS DOUBLE))
                     * sqrt(CAST(m.n AS DOUBLE) - 1.0))) AS g
      FROM nat nt CROSS JOIN mom m),
    crit AS (
      SELECT n,
             (n - 1.0) / sqrt(CAST(n AS DOUBLE))
               * sqrt({_T_0001_23!r} * {_T_0001_23!r}
                      / (n - 2.0 + {_T_0001_23!r} * {_T_0001_23!r}))
               AS g_crit
      FROM mom),
    worst AS (
      SELECT nk, g FROM dev ORDER BY g DESC, nk LIMIT 1)
    SELECT c.n AS n_nations,
           w.nk AS extreme_nation,
           round(w.g, 6) AS g_stat,
           round(c.g_crit, 6) AS g_crit,
           w.g > c.g_crit AS reject_outlier
    FROM crit c CROSS JOIN worst w
    """,
    tags=("outlier", "smallsample", "grubbs"),
)
def q_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs test (maximum normed residual) on the 25 nation revenue
    totals: G = max|x - xbar|/s vs the max-selection-aware critical
    value G_crit = (n-1)/sqrt(n) * sqrt(t^2/(n - 2 + t^2)) with
    t = t_{{alpha/(2n), n-2}} = t_{{0.001, 23}} at alpha = 0.05 --
    2.822 at n = 25, far above the Thompson tau screen's 2.33 on the
    SAME totals (thompson_tau_outlier), because Grubbs prices in that
    the tested point was CHOSEN as the most extreme. The two verdicts
    side by side are the screen-vs-test distinction. Exact integer
    moments; one t literal shared by both engines."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nat = (
        orders.join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast(_DEC)
            .alias("cents")
        )
    )
    mom = nat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast(_DEC).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast(_DEC).alias("s2"),
    )
    nd = F.col("n").cast("double")
    s_samp = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
            "double"
        )
    ) / (F.sqrt(nd) * F.sqrt(nd - 1.0))
    dev = nat.crossJoin(F.broadcast(mom)).select(
        "nk",
        "n",
        (
            F.abs(
                F.col("cents").cast("double")
                - F.col("s1").cast("double") / F.col("n")
            )
            / s_samp
        ).alias("g"),
    )
    crit = mom.select(
        "n",
        (
            (F.col("n") - 1.0)
            / F.sqrt(nd)
            * F.sqrt(
                _T_0001_23
                * _T_0001_23
                / (F.col("n") - 2.0 + _T_0001_23 * _T_0001_23)
            )
        ).alias("g_crit"),
    )
    worst = (
        dev.orderBy(F.col("g").desc(), "nk")
        .limit(1)
        .select(F.col("nk").alias("extreme_nation"), F.col("g"))
    )
    return crit.crossJoin(F.broadcast(worst)).select(
        F.col("n").alias("n_nations"),
        "extreme_nation",
        F.round(F.col("g"), 6).alias("g_stat"),
        F.round(F.col("g_crit"), 6).alias("g_crit"),
        (F.col("g") > F.col("g_crit")).alias("reject_outlier"),
    )


@register(
    "hoover_index",
    """
    WITH cust AS (
      SELECT o_custkey AS ck,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS HUGEINT) AS cents
      FROM orders GROUP BY o_custkey),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS s
      FROM cust),
    ex AS (
      SELECT m.n, m.s,
             CAST(sum(CASE WHEN m.n * c.cents > m.s
                           THEN m.n * c.cents - m.s ELSE 0 END)
                  AS HUGEINT) AS excess,
             CAST(sum(CASE WHEN m.n * c.cents > m.s THEN 1 ELSE 0 END)
                  AS BIGINT) AS donors
      FROM cust c CROSS JOIN mom m
      GROUP BY m.n, m.s)
    SELECT CAST(n AS BIGINT) AS n_customers,
           donors AS customers_above_mean,
           CAST(1000000 * excess // (n * s) AS BIGINT) AS hoover_ppm,
           round(CAST(excess AS DOUBLE) / CAST(n * s AS DOUBLE), 6)
             AS hoover_index
    FROM ex
    """,
    tags=("inequality", "hoover", "distribution"),
)
def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover ("Robin Hood") index over customer revenue totals: the
    share of ALL revenue that would have to move from above-mean to
    below-mean customers to equalize spending -- the vertical-gap
    maximum of the Lorenz diagram, completing the Gini / Atkinson /
    Palma / Theil inequality family already shipped. All-integer
    form: H = sum(max(n*x_i - S, 0)) / (n*S), emitted first as an
    EXACT floor-division ppm BIGINT (engine-proof) and then as the
    rounded double. Population = customers with at least one order
    (zeros are structural TPC-H absences, not observed accounts)."""
    orders = read_table(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast(_DEC)
        .alias("cents")
    )
    mom = cust.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("cents").cast(_DEC).alias("s"),
    )
    over = F.col("n") * F.col("cents") > F.col("s")
    ex = (
        cust.crossJoin(F.broadcast(mom))
        .groupBy("n", "s")
        .agg(
            F.sum(
                F.when(over, F.col("n") * F.col("cents") - F.col("s"))
                .otherwise(F.lit(0).cast(_DEC))
            )
            .cast(_DEC)
            .alias("excess"),
            F.sum(F.when(over, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("donors"),
        )
    )
    return ex.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("donors").alias("customers_above_mean"),
        F.expr("CAST(1000000 * excess DIV (n * s) AS BIGINT)").alias(
            "hoover_ppm"
        ),
        F.round(
            F.col("excess").cast("double")
            / (F.col("n") * F.col("s")).cast("double"),
            6,
        ).alias("hoover_index"),
    )
