"""Extension batch 87: economic index/inequality closures (Tornqvist
index, Atkinson index, Palma ratio) and the A/B infrastructure pair
(sample-ratio-mismatch + delta-method ratio metric).

price_index_fisher covers the Laspeyres/Paasche/Fisher family; the
Tornqvist is the superlative LOG-form index Divisia chaining uses.
gini/theil/herfindahl measure inequality by area/entropy/concentration;
Atkinson adds the welfare-theoretic form (with explicit inequality
aversion) and Palma the policy-facing tail-share ratio. The A/B pair
is what experiment platforms actually gate on: an SRM chi-square
before reading ANY metric, and a delta-method z for ratio metrics
(revenue per order) that naive per-user t-tests get wrong.

Exactness: per-part/customer log terms floor to e9 integers before
cross-entity sums; share cuts come off the two-level rank plan's
exact prefix sums; every moment is an exact integer until the final
double step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Tornqvist price index 1996 -> 1997.
# ---------------------------------------------------------------------------
@register(
    "tornqvist_price_index",
    """
    WITH py AS (
      SELECT l.l_partkey AS pk, date_part('year', o.o_orderdate) AS yr,
             CAST(sum(round(l.l_extendedprice * 100, 0)) AS HUGEINT) AS rev,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS HUGEINT) AS qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE date_part('year', o.o_orderdate) IN (1996, 1997)
      GROUP BY l.l_partkey, date_part('year', o.o_orderdate)),
    tot AS (
      SELECT yr, CAST(sum(rev) AS HUGEINT) AS trev FROM py GROUP BY yr),
    paired AS (
      SELECT a.pk,
             CAST(a.rev AS DOUBLE) / ta.trev AS w0,
             CAST(b.rev AS DOUBLE) / tb.trev AS w1,
             CAST(a.rev AS DOUBLE) / a.qty AS p0,
             CAST(b.rev AS DOUBLE) / b.qty AS p1
      FROM py a JOIN py b ON a.pk = b.pk AND a.yr = 1996 AND b.yr = 1997
      JOIN tot ta ON ta.yr = 1996 JOIN tot tb ON tb.yr = 1997),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CAST(floor(1e9 * ((w0 + w1) / 2.0 * ln(p1 / p0)) + 0.5)
                           AS BIGINT)) AS HUGEINT) AS slog,
             CAST(sum(CAST(floor(1e9 * (w0 + w1) + 0.5) AS BIGINT)) AS HUGEINT)
               AS swsum
      FROM paired)
    SELECT n_parts,
           round(CAST(swsum AS DOUBLE) / 1e9 / 2.0, 6) AS matched_weight,
           round(exp(CAST(slog AS DOUBLE) / 1e9), 6) AS tornqvist_index
    FROM terms
    """,
    tags=("econ", "index", "exact-arith"),
)
def q_tornqvist_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tornqvist price index 1996 -> 1997 over parts traded in BOTH
    years: ln T = sum (w0 + w1)/2 * ln(p1/p0) with revenue-share
    weights and unit values from exact integer revenue/quantity sums;
    each part's log term floors to an e9 integer before the sum. The
    superlative index that tracks a true cost-of-living index to
    second order -- what price_index_fisher approximates
    geometrically, Tornqvist does in logs. matched_weight reports how
    much of revenue the matched basket covers."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    py = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(F.col("l_partkey").alias("pk"), F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0)).cast(_DEC).alias("rev"),
            F.sum(F.col("l_quantity").cast("bigint")).cast(_DEC).alias("qty"),
        )
    )
    tot = py.groupBy("yr").agg(F.sum("rev").cast(_DEC).alias("trev"))
    a = py.where(F.col("yr") == 1996).alias("a")
    b = py.where(F.col("yr") == 1997).alias("b")
    ta = tot.where(F.col("yr") == 1996).select(F.col("trev").alias("trev0"))
    tb = tot.where(F.col("yr") == 1997).select(F.col("trev").alias("trev1"))
    paired = (
        a.join(b, F.col("a.pk") == F.col("b.pk"))
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            (F.col("a.rev").cast("double") / F.col("trev0")).alias("w0"),
            (F.col("b.rev").cast("double") / F.col("trev1")).alias("w1"),
            (F.col("a.rev").cast("double") / F.col("a.qty")).alias("p0"),
            (F.col("b.rev").cast("double") / F.col("b.qty")).alias("p1"),
        )
    )
    terms = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(
            F.floor(
                F.lit(1e9)
                * (
                    (F.col("w0") + F.col("w1"))
                    / 2.0
                    * F.log(F.col("p1") / F.col("p0"))
                )
                + 0.5
            ).cast("bigint")
        )
        .cast(_DEC)
        .alias("slog"),
        F.sum(
            F.floor(F.lit(1e9) * (F.col("w0") + F.col("w1")) + 0.5).cast("bigint")
        )
        .cast(_DEC)
        .alias("swsum"),
    )
    return terms.select(
        "n_parts",
        F.round(F.col("swsum").cast("double") / 1e9 / 2.0, 6).alias("matched_weight"),
        F.round(F.exp(F.col("slog").cast("double") / 1e9), 6).alias(
            "tornqvist_index"
        ),
    )


# ---------------------------------------------------------------------------
# Atkinson inequality index over customer spend.
# ---------------------------------------------------------------------------
@register(
    "atkinson_index",
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS s
      FROM orders GROUP BY o_custkey),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(s) AS HUGEINT) AS ssum,
             CAST(sum(CAST(floor(1e9 * ln(CAST(s AS DOUBLE)) + 0.5) AS BIGINT))
                  AS HUGEINT) AS slog,
             CAST(sum(CAST(floor(1e15 / CAST(s AS DOUBLE) + 0.5) AS BIGINT))
                  AS HUGEINT) AS sinv
      FROM spend)
    SELECT n AS n_customers,
           round(CAST(ssum AS DOUBLE) / n / 100.0, 2) AS mean_spend_dollars,
           round(1.0 - exp(CAST(slog AS DOUBLE) / 1e9 / n)
                 / (CAST(ssum AS DOUBLE) / n), 6) AS atkinson_eps1,
           round(1.0 - CAST(n AS DOUBLE) * n
                 / (CAST(ssum AS DOUBLE) / 1e15 * sinv), 6) AS atkinson_eps2
    FROM terms
    """,
    tags=("econ", "inequality", "exact-arith"),
)
def q_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality of customer spend at aversion eps = 1
    (1 - geometric/arithmetic mean) and eps = 2 (1 - harmonic/
    arithmetic): the welfare reading is 'the share of total spend
    society would give up for perfect equality'. Log terms floor to
    e9 integers and reciprocals to e15 integers per customer before
    the sums -- exact addends both engines. Complements gini (area),
    theil (entropy), herfindahl (concentration) with the
    explicitly-normative member of the family."""
    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("s")
    )
    terms = spend.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast(_DEC).alias("ssum"),
        F.sum(
            F.floor(F.lit(1e9) * F.log(F.col("s").cast("double")) + 0.5).cast(
                "bigint"
            )
        )
        .cast(_DEC)
        .alias("slog"),
        F.sum(
            F.floor(F.lit(1e15) / F.col("s").cast("double") + 0.5).cast("bigint")
        )
        .cast(_DEC)
        .alias("sinv"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("ssum").cast("double") / F.col("n")
    return terms.select(
        F.col("n").alias("n_customers"),
        F.round(mean / 100.0, 2).alias("mean_spend_dollars"),
        F.round(
            1.0 - F.exp(F.col("slog").cast("double") / 1e9 / F.col("n")) / mean, 6
        ).alias("atkinson_eps1"),
        F.round(
            1.0
            - nd * F.col("n")
            / (F.col("ssum").cast("double") / 1e15 * F.col("sinv")),
            6,
        ).alias("atkinson_eps2"),
    )


# ---------------------------------------------------------------------------
# Palma ratio: top-10% vs bottom-40% spend shares.
# ---------------------------------------------------------------------------
@register(
    "palma_ratio",
    """
    WITH spend AS (
      SELECT o_custkey AS ck,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS s
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT s,
             CAST(row_number() OVER (ORDER BY s, ck) AS BIGINT) AS r,
             sum(s) OVER (ORDER BY s, ck
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM spend),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS HUGEINT) AS st
      FROM spend),
    cuts AS (
      SELECT
        (SELECT cum FROM ranked, tot WHERE r = (4 * n) // 10) AS c40,
        (SELECT cum FROM ranked, tot WHERE r = (9 * n) // 10) AS c90)
    SELECT t.n AS n_customers,
           round(CAST(c.c40 AS DOUBLE) / CAST(t.st AS DOUBLE), 6)
             AS bottom40_share,
           round((CAST(t.st AS DOUBLE) - c.c90) / CAST(t.st AS DOUBLE), 6)
             AS top10_share,
           round((CAST(t.st AS DOUBLE) - c.c90) / CAST(c.c40 AS DOUBLE), 6)
             AS palma_ratio
    FROM cuts c CROSS JOIN tot t
    """,
    tags=("econ", "inequality", "exact-arith"),
)
def q_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio of customer spend: (top-10% share)/(bottom-40%
    share), the cut points taken as EXACT ranks floor(0.4 n) and
    floor(0.9 n) under the deterministic (spend, custkey) total order,
    cumulative spend from the rank operator's exact prefix sums. The
    'middle 50% is stable, watch the tails' inequality summary that
    gini compresses away."""
    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("s")
    )
    ranked = with_global_rank(
        spend, "s", [F.col("s"), F.col("ck")], prefix_sum={"cum": "s"}
    ).select(F.col("global_rank").alias("r"), "cum")
    tot = spend.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast(_DEC).alias("st"),
    )
    rt = ranked.crossJoin(F.broadcast(tot))
    c40 = rt.where(F.col("r") == F.expr("(4 * n) DIV 10")).select(
        F.col("cum").alias("c40")
    )
    c90 = rt.where(F.col("r") == F.expr("(9 * n) DIV 10")).select(
        F.col("cum").alias("c90")
    )
    return (
        tot.crossJoin(F.broadcast(c40))
        .crossJoin(F.broadcast(c90))
        .select(
            F.col("n").alias("n_customers"),
            F.round(
                F.col("c40").cast("double") / F.col("st").cast("double"), 6
            ).alias("bottom40_share"),
            F.round(
                (F.col("st").cast("double") - F.col("c90"))
                / F.col("st").cast("double"),
                6,
            ).alias("top10_share"),
            F.round(
                (F.col("st").cast("double") - F.col("c90"))
                / F.col("c40").cast("double"),
                6,
            ).alias("palma_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# SRM check + delta-method ratio metric for a hash-split experiment.
# ---------------------------------------------------------------------------
@register(
    "srm_delta_ratio",
    """
    WITH cust AS (
      SELECT o_custkey AS ck, o_custkey % 2 AS arm,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY o_custkey),
    g AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM cust GROUP BY arm),
    r AS (
      SELECT arm, n,
             CAST(sx AS DOUBLE) / sy AS ratio,
             CAST(sy AS DOUBLE) / n AS ybar,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS vx,
             (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1) AS vy,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1) AS cxy
      FROM g),
    d AS (
      SELECT a.n AS n1, b.n AS n0,
             a.ratio AS r1, b.ratio AS r0,
             (a.vx - 2.0 * a.ratio * a.cxy + a.ratio * a.ratio * a.vy)
               / (a.ybar * a.ybar) / a.n AS var1,
             (b.vx - 2.0 * b.ratio * b.cxy + b.ratio * b.ratio * b.vy)
               / (b.ybar * b.ybar) / b.n AS var0
      FROM (SELECT * FROM r WHERE arm = 1) a
      CROSS JOIN (SELECT * FROM r WHERE arm = 0) b)
    SELECT n1 AS n_arm1, n0 AS n_arm0,
           round((CAST(n1 AS DOUBLE) - n0) * (CAST(n1 AS DOUBLE) - n0)
                 / (CAST(n1 AS DOUBLE) + n0), 4) AS srm_chi2,
           round((r1 - r0) / 100.0, 4) + 0.0 AS ratio_diff_dollars,
           round((r1 - r0) / sqrt(var1 + var0), 6) + 0.0 AS delta_z
    FROM d
    """,
    tags=("experiment", "ab-test", "exact-arith"),
)
def q_srm_delta_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-platform gate pair on a parity hash split of
    customers: (1) the SRM chi-square (n1-n0)^2/(n1+n0) against the
    designed 50/50 -- a significant value means the assignment itself
    broke and NO metric downstream is readable; (2) the delta-method
    z for the RATIO metric revenue-per-order, Var(X/Y) ~ (vx - 2R cxy
    + R^2 vy)/(ybar^2 n) per arm -- the correct treatment of
    cluster-level ratio metrics a per-order t-test gets wrong. All
    moments exact integers until the final doubles."""
    orders = read_table(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    ).select((F.col("ck") % 2).alias("arm"), "x", "y")
    dd = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    g = cust.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(dd("x") * dd("x")).cast(_DEC).alias("sxx"),
        F.sum(dd("x") * dd("y")).cast(_DEC).alias("sxy"),
        F.sum(dd("y") * dd("y")).cast(_DEC).alias("syy"),
    )
    r = g.select(
        "arm",
        "n",
        (F.col("sx").cast("double") / F.col("sy")).alias("ratio"),
        (F.col("sy").cast("double") / F.col("n")).alias("ybar"),
        (
            (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("vx"),
        (
            (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("vy"),
        (
            (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("cxy"),
    )
    a = r.where(F.col("arm") == 1).alias("a")
    b = r.where(F.col("arm") == 0).alias("b")

    def var_arm(p):
        return (
            (
                F.col(f"{p}.vx")
                - 2.0 * F.col(f"{p}.ratio") * F.col(f"{p}.cxy")
                + F.col(f"{p}.ratio") * F.col(f"{p}.ratio") * F.col(f"{p}.vy")
            )
            / (F.col(f"{p}.ybar") * F.col(f"{p}.ybar"))
            / F.col(f"{p}.n")
        )

    d = a.crossJoin(F.broadcast(b)).select(
        F.col("a.n").alias("n1"),
        F.col("b.n").alias("n0"),
        F.col("a.ratio").alias("r1"),
        F.col("b.ratio").alias("r0"),
        var_arm("a").alias("var1"),
        var_arm("b").alias("var0"),
    )
    n1d = F.col("n1").cast("double")
    return d.select(
        F.col("n1").alias("n_arm1"),
        F.col("n0").alias("n_arm0"),
        F.round(
            (n1d - F.col("n0")) * (n1d - F.col("n0")) / (n1d + F.col("n0")), 4
        ).alias("srm_chi2"),
        (F.round((F.col("r1") - F.col("r0")) / 100.0, 4) + 0.0).alias(
            "ratio_diff_dollars"
        ),
        (
            F.round(
                (F.col("r1") - F.col("r0")) / F.sqrt(F.col("var1") + F.col("var0")),
                6,
            )
            + 0.0
        ).alias("delta_z"),
    )
