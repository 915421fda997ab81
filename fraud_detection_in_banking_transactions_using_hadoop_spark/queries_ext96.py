"""Extension batch 96: actuarial / extreme-value closures -- a GPD
peaks-over-threshold fit, the compound-Poisson aggregate-loss check,
and Buhlmann credibility weights.

gumbel_block_maxima fits ANNUAL maxima and hill_tail_index the raw
tail exponent; POT/GPD is the modern EVT workhorse (use every
exceedance, not one per block). The compound-Poisson identity
Var(S) = lambda E[X^2] is the collective risk model every reserving
exercise starts from -- its ratio against the OBSERVED daily loss
variance is a one-number overdispersion audit. Buhlmann credibility
Z = m/(m+k) is how actuaries blend an entity's own history with the
book -- the same shrinkage eb_shrunk_rates does for rates, derived
here for severities with the variance-components k.

Exactness: thresholds are exact rank-plan order statistics;
exceedance and severity moments are exact integers (whole dollars);
per-customer variance components use the floor-division identity
(<= 1 error per customer, identical both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# GPD method-of-moments fit over the p99 threshold.
# ---------------------------------------------------------------------------
@register(
    "gpd_pot_fit",
    """
    WITH vals AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100 AS v,
             o_orderkey AS ok
      FROM orders),
    spine AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY v),
    ranked AS (
      SELECT v, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM spine),
    thr AS (
      SELECT min(v) AS u FROM ranked, tot WHERE 100 * cc >= 99 * n),
    exc AS (
      SELECT v - (SELECT u FROM thr) AS e FROM vals
      WHERE v > (SELECT u FROM thr)),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(e) AS HUGEINT) AS s,
             CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS q
      FROM exc),
    c AS (
      SELECT k,
             CAST(s AS DOUBLE) / k AS m,
             (CAST(k AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
               / (CAST(k AS DOUBLE) * k) AS v2
      FROM mom)
    SELECT (SELECT CAST(u AS BIGINT) FROM thr) AS threshold_dollars,
           k AS n_exceedances,
           round(m, 2) AS mean_excess_dollars,
           round(0.5 * (1.0 - m * m / v2), 6) + 0.0 AS gpd_xi,
           round(0.5 * m * (m * m / v2 + 1.0), 2) AS gpd_beta
    FROM c
    """,
    tags=("evt", "tail", "exact-arith"),
)
def q_gpd_pot_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized Pareto fit of order totals above the EXACT p99
    order statistic (whole dollars, rank-plan threshold): method of
    moments xi = (1 - m^2/s^2)/2, beta = m(m^2/s^2 + 1)/2 on exact
    integer exceedance moments (population variance). xi > 0 means a
    genuinely heavy tail where Gumbel/normal reserving understates
    risk; the mean-excess value doubles as the e(u) point the POT
    literature plots."""
    orders = read_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT) DIV 100").alias("v"),
        F.col("o_orderkey").alias("ok"),
    )
    spine = vals.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ranked = with_global_rank(spine, "v", [F.col("v")], prefix_sum={"cc": "c"})
    tot = spine.agg(F.sum("c").cast("bigint").alias("n"))
    thr = (
        ranked.crossJoin(F.broadcast(tot))
        .where(100 * F.col("cc") >= 99 * F.col("n"))
        .agg(F.min("v").alias("u"))
    )
    exc = (
        vals.crossJoin(F.broadcast(thr))
        .where(F.col("v") > F.col("u"))
        .select((F.col("v") - F.col("u")).alias("e"), "u")
    )
    mom = exc.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("e").cast(_DEC).alias("s"),
        F.sum(F.col("e").cast(_DEC) * F.col("e").cast(_DEC)).cast(_DEC).alias("q"),
        F.max("u").alias("u"),
    )
    m = F.col("s").cast("double") / F.col("k")
    v2 = (
        F.col("k").cast("double") * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s")
    ) / (F.col("k").cast("double") * F.col("k"))
    c = mom.select("k", "u", m.alias("m"), v2.alias("v2"))
    return c.select(
        F.col("u").cast("bigint").alias("threshold_dollars"),
        F.col("k").alias("n_exceedances"),
        F.round("m", 2).alias("mean_excess_dollars"),
        (
            F.round(0.5 * (1.0 - F.col("m") * F.col("m") / F.col("v2")), 6) + 0.0
        ).alias("gpd_xi"),
        F.round(
            0.5 * F.col("m") * (F.col("m") * F.col("m") / F.col("v2") + 1.0), 2
        ).alias("gpd_beta"),
    )


# ---------------------------------------------------------------------------
# Compound-Poisson aggregate daily loss audit.
# ---------------------------------------------------------------------------
@register(
    "compound_poisson_aggregate",
    """
    WITH losses AS (
      SELECT l_shipdate AS dt,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) // 100 AS x
      FROM lineitem WHERE l_returnflag = 'R'),
    sev AS (
      SELECT CAST(count(*) AS BIGINT) AS nx,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qx
      FROM losses),
    daily AS (
      SELECT dt, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(x) AS BIGINT) AS loss
      FROM losses GROUP BY dt),
    dstat AS (
      SELECT CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(cnt) AS HUGEINT) AS scnt,
             CAST(sum(loss) AS HUGEINT) AS sloss,
             CAST(sum(CAST(loss AS HUGEINT) * loss) AS HUGEINT) AS qloss
      FROM daily),
    c AS (
      SELECT d.nd,
             CAST(d.scnt AS DOUBLE) / d.nd AS lam,
             CAST(s.sx AS DOUBLE) / s.nx AS ex,
             CAST(s.qx AS DOUBLE) / s.nx AS ex2,
             (CAST(d.nd AS DOUBLE) * d.qloss
              - CAST(d.sloss AS DOUBLE) * d.sloss)
               / (CAST(d.nd AS DOUBLE) * d.nd) AS obs_var
      FROM dstat d CROSS JOIN sev s)
    SELECT nd AS n_days,
           round(lam, 4) AS lambda_per_day,
           round(ex, 2) AS mean_severity_dollars,
           round(lam * ex, 2) AS predicted_daily_loss_dollars,
           round(sqrt(lam * ex2), 2) AS predicted_sd_dollars,
           round(sqrt(obs_var), 2) AS observed_sd_dollars,
           round(obs_var / (lam * ex2), 4) AS dispersion_ratio
    FROM c
    """,
    tags=("actuarial", "risk", "exact-arith"),
)
def q_compound_poisson_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collective risk model audit on daily returned-line losses:
    under compound Poisson, Var(S) = lambda E[X^2]; the
    dispersion_ratio compares the OBSERVED daily loss variance (exact
    integer moments) against that prediction. Ratio >> 1 means
    either clustered claim arrivals or common-shock severities --
    both break the independence the premium formula assumes; this is
    THE check before using lambda E[X] as a daily reserve."""
    li = read_table(spark, sf_dir, "lineitem")
    losses = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_shipdate").alias("dt"),
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT) DIV 100").alias("x"),
    )
    sev = losses.agg(
        F.count(F.lit(1)).cast("bigint").alias("nx"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).cast(_DEC).alias("qx"),
    )
    daily = losses.groupBy("dt").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("x").cast("bigint").alias("loss"),
    )
    dstat = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("cnt").cast(_DEC).alias("scnt"),
        F.sum("loss").cast(_DEC).alias("sloss"),
        F.sum(F.col("loss").cast(_DEC) * F.col("loss").cast(_DEC))
        .cast(_DEC)
        .alias("qloss"),
    )
    c = dstat.crossJoin(F.broadcast(sev)).select(
        "nd",
        (F.col("scnt").cast("double") / F.col("nd")).alias("lam"),
        (F.col("sx").cast("double") / F.col("nx")).alias("ex"),
        (F.col("qx").cast("double") / F.col("nx")).alias("ex2"),
        (
            (
                F.col("nd").cast("double") * F.col("qloss").cast("double")
                - F.col("sloss").cast("double") * F.col("sloss")
            )
            / (F.col("nd").cast("double") * F.col("nd"))
        ).alias("obs_var"),
    )
    return c.select(
        F.col("nd").alias("n_days"),
        F.round("lam", 4).alias("lambda_per_day"),
        F.round("ex", 2).alias("mean_severity_dollars"),
        F.round(F.col("lam") * F.col("ex"), 2).alias(
            "predicted_daily_loss_dollars"
        ),
        F.round(F.sqrt(F.col("lam") * F.col("ex2")), 2).alias(
            "predicted_sd_dollars"
        ),
        F.round(F.sqrt("obs_var"), 2).alias("observed_sd_dollars"),
        F.round(F.col("obs_var") / (F.col("lam") * F.col("ex2")), 4).alias(
            "dispersion_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Buhlmann-Straub credibility weights for customer order values.
# ---------------------------------------------------------------------------
@register(
    "buhlmann_credibility",
    """
    WITH obs AS (
      SELECT o_custkey AS ck,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100 AS x
      FROM orders),
    per AS (
      SELECT ck, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
      FROM obs GROUP BY ck),
    comp AS (
      SELECT CAST(count(*) AS BIGINT) AS i,
             CAST(sum(m) AS HUGEINT) AS mm,
             CAST(sum(s) AS HUGEINT) AS ss,
             CAST(sum((m * q - s * s) // m) AS HUGEINT) AS within,
             CAST(sum(m - 1) AS HUGEINT) AS dfw,
             CAST(sum((s * s) // m) AS HUGEINT) AS sq_over_m,
             CAST(sum(CAST(m AS HUGEINT) * m) AS HUGEINT) AS m2
      FROM per),
    vc AS (
      SELECT i,
             CAST(within AS DOUBLE) / CAST(dfw AS DOUBLE) AS vhat,
             (CAST(sq_over_m AS DOUBLE) - CAST(ss AS DOUBLE) * ss / mm
              - (i - 1) * (CAST(within AS DOUBLE) / CAST(dfw AS DOUBLE)))
               / (CAST(mm AS DOUBLE) - CAST(m2 AS DOUBLE) / mm) AS ahat
      FROM comp)
    SELECT CAST(i AS BIGINT) AS n_customers,
           round(vhat, 2) AS process_var_dollars2,
           round(ahat, 2) AS between_var_dollars2,
           round(vhat / ahat, 4) AS credibility_k,
           round(1.0 / (1.0 + vhat / ahat), 6) AS z_at_1_order,
           round(5.0 / (5.0 + vhat / ahat), 6) AS z_at_5_orders,
           round(20.0 / (20.0 + vhat / ahat), 6) AS z_at_20_orders
    FROM vc
    """,
    tags=("actuarial", "credibility", "exact-arith"),
)
def q_buhlmann_credibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buhlmann-Straub variance components for customer order values:
    process variance vhat = pooled within-customer variance,
    between-variance ahat from the Straub estimator, k = vhat/ahat,
    and the credibility weight Z = m/(m+k) at 1/5/20 orders -- how
    much an individual's own average should outweigh the book. The
    per-customer sums use the floor-division identity (exact both
    engines); only the final ratios are doubles. eb_shrunk_rates for
    RATES; this is the severity-side classic."""
    orders = read_table(spark, sf_dir, "orders")
    obs = orders.select(
        F.col("o_custkey").alias("ck"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT) DIV 100").alias("x"),
    )
    per = obs.groupBy("ck").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast(_DEC).alias("s"),
        F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).cast(_DEC).alias("q"),
    )
    comp = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("i"),
        F.sum("m").cast(_DEC).alias("mm"),
        F.sum("s").cast(_DEC).alias("ss"),
        F.sum(F.expr("CAST((m * q - s * s) DIV m AS DECIMAL(38,0))"))
        .cast(_DEC)
        .alias("within"),
        F.sum(F.col("m") - 1).cast(_DEC).alias("dfw"),
        F.sum(F.expr("CAST((s * s) DIV m AS DECIMAL(38,0))")).cast(_DEC).alias(
            "sq_over_m"
        ),
        F.sum(F.col("m").cast(_DEC) * F.col("m").cast(_DEC)).cast(_DEC).alias("m2"),
    )
    vhat = F.col("within").cast("double") / F.col("dfw").cast("double")
    ahat = (
        F.col("sq_over_m").cast("double")
        - F.col("ss").cast("double") * F.col("ss") / F.col("mm")
        - (F.col("i") - 1) * vhat
    ) / (F.col("mm").cast("double") - F.col("m2").cast("double") / F.col("mm"))
    vc = comp.select("i", vhat.alias("vhat"), ahat.alias("ahat"))
    k = F.col("vhat") / F.col("ahat")
    return vc.select(
        F.col("i").cast("bigint").alias("n_customers"),
        F.round("vhat", 2).alias("process_var_dollars2"),
        F.round("ahat", 2).alias("between_var_dollars2"),
        F.round(k, 4).alias("credibility_k"),
        F.round(1.0 / (1.0 + k), 6).alias("z_at_1_order"),
        F.round(5.0 / (5.0 + k), 6).alias("z_at_5_orders"),
        F.round(20.0 / (20.0 + k), 6).alias("z_at_20_orders"),
    )
