"""Extension batch 167 (round 6): the missing causal estimators, all
on one shared observational setup -- treatment T = the order is
1-URGENT, outcome Y = order cents, confounder X = the customer's
account balance, discretized into 10 fixed literal bins. Three
queries: g-formula standardization (outcome regression only), AIPW
(doubly robust: the influence-function combination of the binned
propensity AND local-linear outcome models -- consistent if EITHER is
right), and the VanderWeele E-value (how strong an unmeasured
confounder would have to be to explain the observed risk ratio away
-- the sensitivity number reviewers now ask for).

Cross-engine discipline:
- Bins are fixed literals (floor((acctbal_cents + 100000)/110000)
  clamped to 0..9) -- scale-free, no rank pass.
- Per-(bin, arm) OLS coefficients come from exact integer moments;
  the propensity e_b = n_treated/n is an exact rational; every
  per-row AIPW influence value is e3-quantized BEFORE the cross-row
  sums (float-sum-order rule), and its variance folds the same
  quantized integers.
- Estimators use only bins where BOTH arms appear (positivity);
  excluded mass is reported, not hidden.
- The E-value is a closed form of four integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

_BASE_SQL = """
    base AS (
      SELECT CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS y,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t,
             CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS x,
             least(greatest(CAST(floor((CAST(round(c.c_acctbal * 100, 0)
               AS BIGINT) + 100000) / 110000.0) AS BIGINT), 0), 9) AS b
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
"""

_CELLS_SQL = """
    cells AS (
      SELECT b, t, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM base GROUP BY b, t),
    ok AS (
      SELECT b FROM cells GROUP BY b
      HAVING count(*) = 2 AND min(n) >= 2)
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    xc = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    return orders.join(
        customer, F.col("c_custkey") == F.col("o_custkey")
    ).select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("y"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("t"),
        xc.alias("x"),
        F.least(
            F.greatest(
                F.floor((xc + 100000) / 110000.0).cast("bigint"), F.lit(0)
            ),
            F.lit(9),
        ).alias("b"),
    )


def _cells(base: DataFrame):
    cells = base.groupBy("b", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("x").cast(_DEC) * F.col("x")).cast(_DEC).alias("sxx"),
        F.sum(F.col("x").cast(_DEC) * F.col("y")).cast(_DEC).alias("sxy"),
    )
    ok = (
        cells.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_arms"),
            F.min("n").alias("n_min"),
        )
        .where((F.col("n_arms") == 2) & (F.col("n_min") >= 2))
        .select("b")
    )
    return cells, ok


@register(
    "gformula_standardization",
    f"""
    WITH {_BASE_SQL},
    {_CELLS_SQL},
    means AS (
      SELECT c.b,
             max(CASE WHEN c.t = 1 THEN CAST(c.sy AS DOUBLE) / c.n END)
               AS y1,
             max(CASE WHEN c.t = 0 THEN CAST(c.sy AS DOUBLE) / c.n END)
               AS y0,
             CAST(sum(c.n) AS BIGINT) AS nb
      FROM cells c JOIN ok ON ok.b = c.b
      GROUP BY c.b),
    tot AS (
      SELECT CAST(sum(nb) AS BIGINT) AS n_used,
             (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_all
      FROM means),
    raw AS (
      SELECT CAST(sum(CASE WHEN t = 1 THEN CAST(y AS HUGEINT) END) AS DOUBLE)
               / sum(CASE WHEN t = 1 THEN 1 ELSE 0 END)
             - CAST(sum(CASE WHEN t = 0 THEN CAST(y AS HUGEINT) END)
                    AS DOUBLE)
               / sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS diff
      FROM base),
    std AS (
      SELECT CAST(sum(CAST(floor((m.y1 - m.y0) * m.nb * 1e3 + 0.5)
                  AS BIGINT)) AS HUGEINT) AS s_e3,
             CAST(count(*) AS BIGINT) AS n_bins
      FROM means m)
    SELECT t.n_all AS n_orders, t.n_used, s.n_bins,
           round(CAST(s.s_e3 AS DOUBLE) / 1e3 / t.n_used / 100.0, 2)
             AS ate_std_dollars,
           round(r.diff / 100.0, 2) AS raw_diff_dollars,
           round((r.diff - CAST(s.s_e3 AS DOUBLE) / 1e3 / t.n_used)
                 / 100.0, 2) + 0.0 AS confounding_bias_dollars
    FROM std s CROSS JOIN tot t CROSS JOIN raw r
    """,
    tags=("causal", "standardization", "gformula"),
)
def q_gformula_standardization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric g-formula (direct standardization): within each
    account-balance bin take the urgent/non-urgent mean revenue
    difference and average it over the MARGINAL bin distribution --
    the outcome-regression-only causal estimate, next to the raw
    arm difference so the confounding bias is a visible number.
    Only bins with both arms (positivity) enter; per-bin terms
    e3-quantize before the cross-bin sum."""
    base = _base(spark, sf_dir)
    cells, ok = _cells(base)
    means = (
        cells.join(ok, "b")
        .groupBy("b")
        .agg(
            F.max(
                F.when(
                    F.col("t") == 1,
                    F.col("sy").cast("double") / F.col("n"),
                )
            ).alias("y1"),
            F.max(
                F.when(
                    F.col("t") == 0,
                    F.col("sy").cast("double") / F.col("n"),
                )
            ).alias("y0"),
            F.sum("n").cast("bigint").alias("nb"),
        )
    )
    tot = means.agg(F.sum("nb").cast("bigint").alias("n_used"))
    n_all = base.agg(F.count(F.lit(1)).cast("bigint").alias("n_all"))
    raw = base.agg(
        (
            F.sum(F.when(F.col("t") == 1, F.col("y").cast(_DEC))).cast(
                "double"
            )
            / F.sum(F.when(F.col("t") == 1, 1).otherwise(0))
            - F.sum(F.when(F.col("t") == 0, F.col("y").cast(_DEC))).cast(
                "double"
            )
            / F.sum(F.when(F.col("t") == 0, 1).otherwise(0))
        ).alias("diff")
    )
    std = means.agg(
        F.sum(
            F.floor(
                (F.col("y1") - F.col("y0")) * F.col("nb") * 1e3 + 0.5
            ).cast("bigint")
        )
        .cast(_DEC)
        .alias("s_e3"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )
    ate = F.col("s_e3").cast("double") / 1e3 / F.col("n_used")
    return (
        std.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(raw))
        .select(
            F.col("n_all").alias("n_orders"),
            "n_used",
            "n_bins",
            F.round(ate / 100.0, 2).alias("ate_std_dollars"),
            F.round(F.col("diff") / 100.0, 2).alias("raw_diff_dollars"),
            (
                F.round((F.col("diff") - ate) / 100.0, 2) + F.lit(0.0)
            ).alias("confounding_bias_dollars"),
        )
    )


@register(
    "aipw_doubly_robust",
    f"""
    WITH {_BASE_SQL},
    {_CELLS_SQL},
    coef AS (
      SELECT c.b, c.t, c.n,
             CASE WHEN c.n * c.sxx - c.sx * c.sx > 0 THEN
               CAST(c.n * c.sxy - c.sx * c.sy AS DOUBLE)
                 / CAST(c.n * c.sxx - c.sx * c.sx AS DOUBLE)
             ELSE 0.0 END AS slope,
             (CAST(c.sy AS DOUBLE)
              - CASE WHEN c.n * c.sxx - c.sx * c.sx > 0 THEN
                  CAST(c.n * c.sxy - c.sx * c.sy AS DOUBLE)
                    / CAST(c.n * c.sxx - c.sx * c.sx AS DOUBLE)
                ELSE 0.0 END * CAST(c.sx AS DOUBLE)) / c.n AS icept
      FROM cells c JOIN ok ON ok.b = c.b),
    prop AS (
      SELECT b,
             CAST(sum(CASE WHEN t = 1 THEN n END) AS DOUBLE)
               / sum(n) AS e
      FROM coef GROUP BY b),
    phi AS (
      SELECT CAST(floor((
               (c1.icept + c1.slope * bb.x)
               - (c0.icept + c0.slope * bb.x)
               + bb.t * (bb.y - (c1.icept + c1.slope * bb.x)) / p.e
               - (1 - bb.t) * (bb.y - (c0.icept + c0.slope * bb.x))
                 / (1.0 - p.e)
             ) * 1e3 + 0.5) AS BIGINT) AS f_e3
      FROM base bb
      JOIN prop p ON p.b = bb.b
      JOIN (SELECT b, slope, icept FROM coef WHERE t = 1) c1
        ON c1.b = bb.b
      JOIN (SELECT b, slope, icept FROM coef WHERE t = 0) c0
        ON c0.b = bb.b),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(f_e3) AS HUGEINT) AS s1,
             CAST(sum(CAST(f_e3 AS HUGEINT) * f_e3) AS HUGEINT) AS s2
      FROM phi)
    SELECT n AS n_used,
           round(CAST(s1 AS DOUBLE) / 1e3 / n / 100.0, 2)
             AS ate_aipw_dollars,
           round(sqrt((CAST(s2 AS DOUBLE) / 1e6 / n
                       - (CAST(s1 AS DOUBLE) / 1e3 / n)
                         * (CAST(s1 AS DOUBLE) / 1e3 / n))
                      / n) / 100.0, 2) AS se_dollars
    FROM agg
    """,
    tags=("causal", "doublyrobust", "aipw"),
)
def q_aipw_doubly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Augmented IPW (doubly robust) ATE of urgent priority on order
    revenue: influence value phi = m1(x) - m0(x) + T(y - m1)/e -
    (1-T)(y - m0)/(1-e), with m_t local-linear OLS per account-balance
    bin (exact integer moments) and e the bin's exact treated
    fraction. Consistent if EITHER the outcome model or the
    propensity is right -- and its SE is just the sample SD of phi
    over sqrt(n). Every phi e3-quantizes before the sum and the
    variance folds the same integers; rows in single-arm bins are
    excluded (positivity)."""
    base = _base(spark, sf_dir)
    cells, ok = _cells(base)
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        den > 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        / den.cast("double"),
    ).otherwise(0.0)
    coef = cells.join(ok, "b").select(
        "b",
        "t",
        "n",
        slope.alias("slope"),
        (
            (
                F.col("sy").cast("double")
                - slope * F.col("sx").cast("double")
            )
            / F.col("n")
        ).alias("icept"),
    )
    prop = coef.groupBy("b").agg(
        (
            F.sum(F.when(F.col("t") == 1, F.col("n"))).cast("double")
            / F.sum("n")
        ).alias("e")
    )
    c1 = coef.where(F.col("t") == 1).select(
        F.col("b").alias("b1"), F.col("slope").alias("sl1"),
        F.col("icept").alias("ic1"),
    )
    c0 = coef.where(F.col("t") == 0).select(
        F.col("b").alias("b0"), F.col("slope").alias("sl0"),
        F.col("icept").alias("ic0"),
    )
    pr = prop.select(F.col("b").alias("bp"), "e")
    m1 = F.col("ic1") + F.col("sl1") * F.col("x")
    m0 = F.col("ic0") + F.col("sl0") * F.col("x")
    f = (
        m1
        - m0
        + F.col("t") * (F.col("y") - m1) / F.col("e")
        - (1 - F.col("t")) * (F.col("y") - m0) / (1.0 - F.col("e"))
    )
    phi = (
        base.join(F.broadcast(pr), F.col("bp") == F.col("b"))
        .join(F.broadcast(c1), F.col("b1") == F.col("b"))
        .join(F.broadcast(c0), F.col("b0") == F.col("b"))
        .select(
            F.floor(f * 1e3 + 0.5).cast("bigint").alias("f_e3")
        )
    )
    agg = phi.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("f_e3").cast(_DEC).alias("s1"),
        F.sum(F.col("f_e3").cast(_DEC) * F.col("f_e3")).cast(_DEC).alias(
            "s2"
        ),
    )
    mean_e3 = F.col("s1").cast("double") / 1e3 / F.col("n")
    return agg.select(
        F.col("n").alias("n_used"),
        F.round(mean_e3 / 100.0, 2).alias("ate_aipw_dollars"),
        F.round(
            F.sqrt(
                (
                    F.col("s2").cast("double") / 1e6 / F.col("n")
                    - mean_e3 * mean_e3
                )
                / F.col("n")
            )
            / 100.0,
            2,
        ).alias("se_dollars"),
    )


@register(
    "evalue_sensitivity",
    f"""
    WITH {_BASE_SQL},
    ret AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
    marked AS (
      SELECT b2.t, CASE WHEN r.l_orderkey IS NOT NULL THEN 1 ELSE 0 END
               AS bad
      FROM (SELECT o_orderkey, CASE WHEN o_orderpriority = '1-URGENT'
                   THEN 1 ELSE 0 END AS t
            FROM orders) b2
      LEFT JOIN ret r ON r.l_orderkey = b2.o_orderkey),
    cnt AS (
      SELECT CAST(sum(CASE WHEN t = 1 THEN bad ELSE 0 END) AS BIGINT) AS k1,
             CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN t = 0 THEN bad ELSE 0 END) AS BIGINT) AS k0,
             CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
      FROM marked),
    rrv AS (
      SELECT k1, n1, k0, n0,
             (CAST(k1 AS DOUBLE) / n1) / (CAST(k0 AS DOUBLE) / n0) AS rr
      FROM cnt),
    ev AS (
      SELECT k1, n1, k0, n0, rr,
             CASE WHEN rr >= 1.0 THEN rr ELSE 1.0 / rr END AS rr_star
      FROM rrv)
    SELECT round(CAST(k1 AS DOUBLE) / n1, 6) AS p_return_urgent,
           round(CAST(k0 AS DOUBLE) / n0, 6) AS p_return_other,
           round(rr, 6) AS risk_ratio,
           round(rr_star + sqrt(rr_star * (rr_star - 1.0)), 4) AS e_value
    FROM ev
    """,
    tags=("causal", "sensitivity", "evalue"),
)
def q_evalue_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VanderWeele E-value for the urgent-priority -> any-returned-line
    association: the minimum risk ratio an UNMEASURED confounder would
    need with both treatment and outcome to fully explain the
    observed RR away -- E = RR* + sqrt(RR*(RR*-1)) on the
    away-from-null direction. An E-value near 1 means the association
    is fragile; large means only an implausibly strong hidden
    confounder could produce it. Four integer counts, one closed
    form -- the sensitivity line every observational readout above
    (g-formula, AIPW) should ship with."""
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    ret = (
        lineitem.where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    marked = (
        orders.select(
            "o_orderkey",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("t"),
        )
        .join(ret, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .select(
            "t",
            F.when(F.col("l_orderkey").isNotNull(), 1)
            .otherwise(0)
            .alias("bad"),
        )
    )
    cnt = marked.agg(
        F.sum(F.when(F.col("t") == 1, F.col("bad")).otherwise(0))
        .cast("bigint")
        .alias("k1"),
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("t") == 0, F.col("bad")).otherwise(0))
        .cast("bigint")
        .alias("k0"),
        F.sum(F.when(F.col("t") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
    )
    rr = (F.col("k1").cast("double") / F.col("n1")) / (
        F.col("k0").cast("double") / F.col("n0")
    )
    rrv = cnt.select("k1", "n1", "k0", "n0", rr.alias("rr"))
    rr_star = F.when(F.col("rr") >= 1.0, F.col("rr")).otherwise(
        1.0 / F.col("rr")
    )
    ev = rrv.select("k1", "n1", "k0", "n0", "rr", rr_star.alias("rr_star"))
    return ev.select(
        F.round(F.col("k1").cast("double") / F.col("n1"), 6).alias(
            "p_return_urgent"
        ),
        F.round(F.col("k0").cast("double") / F.col("n0"), 6).alias(
            "p_return_other"
        ),
        F.round(F.col("rr"), 6).alias("risk_ratio"),
        F.round(
            F.col("rr_star")
            + F.sqrt(F.col("rr_star") * (F.col("rr_star") - 1.0)),
            4,
        ).alias("e_value"),
    )
