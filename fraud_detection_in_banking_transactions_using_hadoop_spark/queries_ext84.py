"""Extension batch 84: parametric distribution fitting -- Weibull via
median-rank regression, lognormal (Gibrat) fit, gamma method-of-
moments -- plus Tukey-HSD pairwise contrasts.

negbin_fit_mom / gumbel_block_maxima / zipf_powerlaw_fit cover counts,
extremes, and power laws; this batch adds the three continuous
lifetime/size laws reliability and pricing work actually fits, and
the post-ANOVA pairwise machinery.

Exactness: every fit is a weighted regression/moment closure on the
DISTINCT-value spine; per-value log terms (c * ln v, c * ln^2 v, ...)
floor to e9 integers BEFORE any cross-value sum, so both engines sum
identical addends; moment products then combine in DECIMAL/HUGEINT
and divide once in double. The Tukey table floor-divides S^2/n in
whole dollars so results stay in integer range at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Weibull shape/scale by median-rank regression on lead times.
# ---------------------------------------------------------------------------
@register(
    "weibull_median_rank_fit",
    """
    WITH gaps AS (
      SELECT date_diff('day', o.o_orderdate, l.l_shipdate) AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE date_diff('day', o.o_orderdate, l.l_shipdate) >= 1),
    spine AS (
      SELECT CAST(d AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS c
      FROM gaps GROUP BY d),
    pre AS (
      SELECT d, c,
             coalesce(sum(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             (SELECT CAST(sum(c) AS BIGINT) FROM spine) AS n
      FROM spine),
    pts AS (
      SELECT c,
             ln(CAST(d AS DOUBLE)) AS x,
             ln(-ln(1.0 - (CAST(10 * (2 * below + c + 1) - 6 AS DOUBLE))
                          / (20.0 * n + 8.0))) AS y
      FROM pre),
    terms AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(floor(1e9 * (c * x) + 0.5) AS HUGEINT)) AS HUGEINT)
               AS sx,
             CAST(sum(CAST(floor(1e9 * (c * y) + 0.5) AS HUGEINT)) AS HUGEINT)
               AS sy,
             CAST(sum(CAST(floor(1e9 * (c * x * y) + 0.5) AS HUGEINT)) AS HUGEINT)
               AS sxy,
             CAST(sum(CAST(floor(1e9 * (c * x * x) + 0.5) AS HUGEINT)) AS HUGEINT)
               AS sxx,
             CAST(sum(CAST(floor(1e9 * (c * y * y) + 0.5) AS HUGEINT)) AS HUGEINT)
               AS syy
      FROM pts),
    fit AS (
      SELECT n,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy / 1e9)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx / 1e9) AS k,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy / 1e9) AS covn,
             (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx / 1e9) AS varxn,
             (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy / 1e9) AS varyn,
             CAST(sx AS DOUBLE) / 1e9 / n AS mx,
             CAST(sy AS DOUBLE) / 1e9 / n AS my
      FROM terms)
    SELECT n AS n_lines,
           round(k, 4) AS shape_k,
           round(exp(-(my - k * mx) / k), 2) AS scale_days,
           round(covn * covn / (varxn * varyn), 6) AS fit_r2
    FROM fit
    """,
    tags=("distribution", "reliability", "exact-arith"),
)
def q_weibull_median_rank_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of order-to-ship lead times by median-rank
    regression: Benard plotting positions F_i = (r_i - 0.3)/(n + 0.4)
    with the DOUBLED spine midrank (exact rational (10(2B+c+1)-6)/
    (20n+8)), then OLS of ln(-ln(1-F)) on ln(d). Each spine value's
    weighted log terms floor to e9 integers, so the five regression
    sums are exact; shape = slope, scale = exp(-intercept/shape).
    The reliability engineer's 'is failure wear-out or infant
    mortality' fit (k > 1 means hazard rises with age)."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    gaps = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.datediff("l_shipdate", "o_orderdate").alias("d"))
        .where(F.col("d") >= 1)
    )
    spine = gaps.groupBy(F.col("d").cast("bigint").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ntot = spine.agg(F.sum("c").cast("bigint").alias("n"))
    pre = (
        with_global_rank(spine, "d", [F.col("d")], prefix_sum={"cc": "c"})
        .select("d", "c", (F.col("cc") - F.col("c")).alias("below"))
        .crossJoin(F.broadcast(ntot))
    )
    x = F.log(F.col("d").cast("double"))
    fexp = (10 * (2 * F.col("below") + F.col("c") + 1) - 6).cast("double") / (
        20.0 * F.col("n") + 8.0
    )
    y = F.log(-F.log(1.0 - fexp))
    pts = pre.select("c", x.alias("x"), y.alias("y"))

    def e9(expr):
        return F.floor(F.lit(1e9) * expr + 0.5).cast(_DEC)

    terms = pts.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(e9(F.col("c") * F.col("x"))).cast(_DEC).alias("sx"),
        F.sum(e9(F.col("c") * F.col("y"))).cast(_DEC).alias("sy"),
        F.sum(e9(F.col("c") * F.col("x") * F.col("y"))).cast(_DEC).alias("sxy"),
        F.sum(e9(F.col("c") * F.col("x") * F.col("x"))).cast(_DEC).alias("sxx"),
        F.sum(e9(F.col("c") * F.col("y") * F.col("y"))).cast(_DEC).alias("syy"),
    )
    nd = F.col("n").cast("double")
    covn = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / 1e9
    varxn = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / 1e9
    varyn = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double") / 1e9
    fit = terms.select(
        "n",
        (covn / varxn).alias("k"),
        covn.alias("covn"),
        varxn.alias("varxn"),
        varyn.alias("varyn"),
        (F.col("sx").cast("double") / 1e9 / F.col("n")).alias("mx"),
        (F.col("sy").cast("double") / 1e9 / F.col("n")).alias("my"),
    )
    return fit.select(
        F.col("n").alias("n_lines"),
        F.round("k", 4).alias("shape_k"),
        F.round(
            F.exp(-(F.col("my") - F.col("k") * F.col("mx")) / F.col("k")), 2
        ).alias("scale_days"),
        F.round(
            F.col("covn") * F.col("covn") / (F.col("varxn") * F.col("varyn")), 6
        ).alias("fit_r2"),
    )


# ---------------------------------------------------------------------------
# Lognormal (Gibrat) fit of order totals.
# ---------------------------------------------------------------------------
@register(
    "lognormal_fit_gibrat",
    """
    WITH spine AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY CAST(round(o_totalprice * 100, 0) AS BIGINT)),
    terms AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS sv,
             CAST(sum(CAST(floor(1e9 * c * ln(CAST(v AS DOUBLE)) + 0.5)
                           AS HUGEINT)) AS HUGEINT) AS sl,
             CAST(sum(CAST(floor(1e9 * c * ln(CAST(v AS DOUBLE))
                                 * ln(CAST(v AS DOUBLE)) + 0.5)
                           AS HUGEINT)) AS HUGEINT) AS sl2
      FROM spine),
    fit AS (
      SELECT n,
             CAST(sl AS DOUBLE) / 1e9 / n AS mu,
             sqrt((CAST(n AS DOUBLE) * sl2 / 1e9
                   - CAST(sl AS DOUBLE) / 1e9 * (CAST(sl AS DOUBLE) / 1e9))
                  / (CAST(n AS DOUBLE) * n)) AS sigma,
             CAST(sv AS DOUBLE) / n AS actual_mean
      FROM terms)
    SELECT n AS n_orders,
           round(mu, 6) AS mu_log_cents,
           round(sigma, 6) AS sigma_log,
           round(exp(mu) / 100.0, 2) AS implied_median_dollars,
           round(exp(mu + sigma * sigma / 2.0) / 100.0, 2)
             AS implied_mean_dollars,
           round(actual_mean / 100.0, 2) AS actual_mean_dollars,
           round(exp(mu + sigma * sigma / 2.0) / actual_mean, 6)
             AS lognormality_ratio
    FROM fit
    """,
    tags=("distribution", "fit", "exact-arith"),
)
def q_lognormal_fit_gibrat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal fit of order totals (Gibrat's law of proportionate
    growth predicts exactly this shape for sizes): mu and sigma of
    ln(cents) from e9-integer weighted log sums on the value spine;
    the implied mean exp(mu + sigma^2/2) against the actual mean is
    the one-number lognormality diagnostic (ratio ~ 1 iff the tail
    really is lognormal). sigma uses the exact n-scaled central
    form before one sqrt."""
    orders = read_table(spark, sf_dir, "orders")
    spine = orders.groupBy(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lnv = F.log(F.col("v").cast("double"))
    terms = spine.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("v").cast(_DEC) * F.col("c").cast(_DEC)).cast(_DEC).alias("sv"),
        F.sum(F.floor(F.lit(1e9) * F.col("c") * lnv + 0.5).cast(_DEC))
        .cast(_DEC)
        .alias("sl"),
        F.sum(F.floor(F.lit(1e9) * F.col("c") * lnv * lnv + 0.5).cast(_DEC))
        .cast(_DEC)
        .alias("sl2"),
    )
    nd = F.col("n").cast("double")
    sl9 = F.col("sl").cast("double") / 1e9
    fit = terms.select(
        "n",
        (sl9 / F.col("n")).alias("mu"),
        F.sqrt(
            (nd * F.col("sl2").cast("double") / 1e9 - sl9 * sl9)
            / (nd * F.col("n"))
        ).alias("sigma"),
        (F.col("sv").cast("double") / F.col("n")).alias("actual_mean"),
    )
    implied_mean = F.exp(F.col("mu") + F.col("sigma") * F.col("sigma") / 2.0)
    return fit.select(
        F.col("n").alias("n_orders"),
        F.round("mu", 6).alias("mu_log_cents"),
        F.round("sigma", 6).alias("sigma_log"),
        F.round(F.exp("mu") / 100.0, 2).alias("implied_median_dollars"),
        F.round(implied_mean / 100.0, 2).alias("implied_mean_dollars"),
        F.round(F.col("actual_mean") / 100.0, 2).alias("actual_mean_dollars"),
        F.round(implied_mean / F.col("actual_mean"), 6).alias("lognormality_ratio"),
    )


# ---------------------------------------------------------------------------
# Gamma method-of-moments fit of daily revenue.
# ---------------------------------------------------------------------------
@register(
    "gamma_fit_mom",
    """
    WITH d AS (
      SELECT CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS sy2
      FROM d),
    c AS (
      SELECT n,
             CAST(sy AS DOUBLE) / n AS m,
             (CAST(n AS DOUBLE) * sy2 - CAST(sy AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * n) AS v
      FROM s)
    SELECT n AS n_days,
           round(m / 100.0, 2) AS mean_dollars,
           round(m * m / v, 4) AS shape_alpha,
           round(v / m / 100.0, 2) AS scale_dollars,
           round(sqrt(v) / m, 6) AS coef_variation
    FROM c
    """,
    tags=("distribution", "fit", "exact-arith"),
)
def q_gamma_fit_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma method-of-moments on daily revenue: shape = m^2/Var,
    scale = Var/m from exact integer moment sums (population
    variance). The two-parameter positive-support default for revenue
    modeling; CV = 1/sqrt(shape) under the fit, so coef_variation
    doubles as a consistency check."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy("o_orderdate").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("y")
    )
    s = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("sy2"),
    )
    nd = F.col("n").cast("double")
    m = F.col("sy").cast("double") / F.col("n")
    v = (nd * F.col("sy2").cast("double") - F.col("sy").cast("double") * F.col("sy")) / (
        nd * F.col("n")
    )
    c = s.select("n", m.alias("m"), v.alias("v"))
    return c.select(
        F.col("n").alias("n_days"),
        F.round(F.col("m") / 100.0, 2).alias("mean_dollars"),
        F.round(F.col("m") * F.col("m") / F.col("v"), 4).alias("shape_alpha"),
        F.round(F.col("v") / F.col("m") / 100.0, 2).alias("scale_dollars"),
        F.round(F.sqrt("v") / F.col("m"), 6).alias("coef_variation"),
    )


# ---------------------------------------------------------------------------
# Tukey-HSD pairwise contrasts across order priorities.
# ---------------------------------------------------------------------------
@register(
    "tukey_hsd_contrasts",
    """
    WITH vals AS (
      SELECT o_orderpriority AS g,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100 AS v
      FROM orders),
    gs AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS HUGEINT) AS s,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
      FROM vals GROUP BY g),
    mse AS (
      SELECT CAST(sum((n * q - s * s) // n) AS HUGEINT) AS wss,
             CAST(sum(n) AS BIGINT) AS nn,
             CAST(count(*) AS BIGINT) AS k
      FROM gs),
    pairs AS (
      SELECT a.g AS g1, b.g AS g2,
             CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n AS diff,
             sqrt(CAST(m.wss AS DOUBLE) / (m.nn - m.k) / 2.0
                  * (1.0 / a.n + 1.0 / b.n)) AS se_q
      FROM gs a JOIN gs b ON a.g < b.g
      CROSS JOIN mse m)
    SELECT g1 AS group_a, g2 AS group_b,
           round(diff, 2) + 0.0 AS mean_diff_dollars,
           round(diff / se_q, 4) + 0.0 AS tukey_q
    FROM pairs ORDER BY g1, g2
    """,
    tags=("stats", "posthoc", "exact-arith"),
)
def q_tukey_hsd_contrasts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-HSD studentized-range contrasts for all 10 priority
    pairs: q = (m_a - m_b) / sqrt(MSE/2 (1/n_a + 1/n_b)) with the
    within-group MSE from the exact floor-division identity (whole
    dollars). The post-hoc step after an ANOVA rejects -- WHICH
    priorities differ, with the multiple-comparison-calibrated
    statistic."""
    orders = read_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.col("o_orderpriority").alias("g"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT) DIV 100").alias("v"),
    )
    vd = F.col("v").cast(_DEC)
    gs = vals.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast(_DEC).alias("s"),
        F.sum(vd * vd).cast(_DEC).alias("q"),
    )
    mse = gs.agg(
        F.sum(F.expr("CAST((n * q - s * s) DIV n AS DECIMAL(38,0))"))
        .cast(_DEC)
        .alias("wss"),
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    a, b = gs.alias("a"), gs.alias("b")
    pairs = (
        a.join(b, F.col("a.g") < F.col("b.g"))
        .crossJoin(F.broadcast(mse))
        .select(
            F.col("a.g").alias("g1"),
            F.col("b.g").alias("g2"),
            (
                F.col("a.s").cast("double") / F.col("a.n")
                - F.col("b.s").cast("double") / F.col("b.n")
            ).alias("diff"),
            F.sqrt(
                F.col("wss").cast("double")
                / (F.col("nn") - F.col("k"))
                / 2.0
                * (1.0 / F.col("a.n") + 1.0 / F.col("b.n"))
            ).alias("se_q"),
        )
    )
    return pairs.select(
        F.col("g1").alias("group_a"),
        F.col("g2").alias("group_b"),
        (F.round("diff", 2) + 0.0).alias("mean_diff_dollars"),
        (F.round(F.col("diff") / F.col("se_q"), 4) + 0.0).alias("tukey_q"),
    ).orderBy("group_a", "group_b")
