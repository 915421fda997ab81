"""Extension batch 201 (round 8): the Bass diffusion model -- the
canonical new-product adoption curve (Bass 1969) -- estimated in-engine
from the customer first-purchase series.

Discrete-Bass estimation is an OLS regression of per-month NEW adopters
n_t on (1, N_{t-1}, N_{t-1}^2) where N is cumulative adopters: the
structural mapping n = p*m + (q-p)*N - (q/m)*N^2 identifies the
innovation rate p, the imitation rate q, and the market size m from the
quadratic's coefficients. The regressor is quantized to integer PERCENT
of the known adopter total ((100*N) DIV m, 0..99), which makes every
regression moment an exact BIGINT; the 3x3 normal-equation solve is
Cramer's rule over those exact moments written as ONE shared SQL text
(double arithmetic, identical expression tree both engines -- the
ridge_regression_2d discipline extended to 3 unknowns).

The month spine is dense (missing months carry n_t = 0, real
information for a diffusion fit): CALENDAR class, capped by the
orders_months domain."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

# Cramer's rule for [tn sx sx2; sx sx2 sx3; sx2 sx3 sx4] [a b c]' =
# [sy sxy sx2y]': shared double-arithmetic expression text.
_D = {
    k: f"CAST({k} AS DOUBLE)"
    for k in ("tn", "sx", "sx2", "sx3", "sx4", "sy", "sxy", "sx2y")
}
_DET = (
    f"({_D['tn']} * ({_D['sx2']} * {_D['sx4']} - {_D['sx3']} * {_D['sx3']})"
    f" - {_D['sx']} * ({_D['sx']} * {_D['sx4']} - {_D['sx3']} * {_D['sx2']})"
    f" + {_D['sx2']} * ({_D['sx']} * {_D['sx3']} - {_D['sx2']} * {_D['sx2']}))"
)
_DET_A = (
    f"({_D['sy']} * ({_D['sx2']} * {_D['sx4']} - {_D['sx3']} * {_D['sx3']})"
    f" - {_D['sx']} * ({_D['sxy']} * {_D['sx4']} - {_D['sx3']} * {_D['sx2y']})"
    f" + {_D['sx2']} * ({_D['sxy']} * {_D['sx3']} - {_D['sx2']} * {_D['sx2y']}))"
)
_DET_B = (
    f"({_D['tn']} * ({_D['sxy']} * {_D['sx4']} - {_D['sx2y']} * {_D['sx3']})"
    f" - {_D['sy']} * ({_D['sx']} * {_D['sx4']} - {_D['sx3']} * {_D['sx2']})"
    f" + {_D['sx2']} * ({_D['sx']} * {_D['sx2y']} - {_D['sx2']} * {_D['sxy']}))"
)
_DET_C = (
    f"({_D['tn']} * ({_D['sx2']} * {_D['sx2y']} - {_D['sxy']} * {_D['sx3']})"
    f" - {_D['sx']} * ({_D['sx']} * {_D['sx2y']} - {_D['sxy']} * {_D['sx2']})"
    f" + {_D['sy']} * ({_D['sx']} * {_D['sx3']} - {_D['sx2']} * {_D['sx2']}))"
)
_COEF_A = f"({_DET_A} / nullif({_DET}, CAST(0 AS DOUBLE)))"
_COEF_B = f"({_DET_B} / nullif({_DET}, CAST(0 AS DOUBLE)))"
_COEF_C = f"({_DET_C} / nullif({_DET}, CAST(0 AS DOUBLE)))"
# structural mapping with x in percent units (N = x*m/100):
#   a = p*m, b = (q-p)*m/100, c = -q*m/1e4
_P = f"({_COEF_A} / CAST(m AS DOUBLE))"
_Q = f"(-10000.0 * {_COEF_C} / CAST(m AS DOUBLE))"
_PEAK = (
    f"CASE WHEN {_P} > CAST(0 AS DOUBLE) AND {_Q} > CAST(0 AS DOUBLE)"
    f" THEN round(ln({_Q} / {_P}) / ({_P} + {_Q}), 4) + 0.0"
    f" ELSE NULL END"
)

_SELECT = f"""
    SELECT tn AS n_months, m AS m_adopters,
           round({_COEF_A}, 6) + 0.0 AS coef_a,
           round({_COEF_B}, 6) + 0.0 AS coef_b,
           round({_COEF_C}, 6) + 0.0 AS coef_c,
           round({_P}, 6) + 0.0 AS p_innovation,
           round({_Q}, 6) + 0.0 AS q_imitation,
           {_PEAK} AS peak_month
"""


@register(
    "bass_diffusion_fit",
    f"""
    WITH ad AS (
      SELECT o_custkey,
             CAST(min(year(o_orderdate) * 12 + month(o_orderdate))
                  AS BIGINT) AS am
      FROM orders GROUP BY 1),
    mm AS (SELECT CAST(min(am) AS BIGINT) AS mn,
                  CAST(max(am) AS BIGINT) AS mx,
                  CAST(count(*) AS BIGINT) AS m FROM ad),
    per AS (SELECT am, CAST(count(*) AS BIGINT) AS n FROM ad GROUP BY 1),
    spine AS (
      SELECT s.t, CAST(coalesce(p.n, 0) AS BIGINT) AS n
      FROM (SELECT unnest(range(mm.mn, mm.mx + 1)) AS t FROM mm) s
      LEFT JOIN per p ON p.am = s.t),
    cum AS (
      SELECT t, n,
             CAST(coalesce(sum(n) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS nprev
      FROM spine),
    xt AS (SELECT t, n, (100 * nprev) // mm.m AS x FROM cum, mm),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS tn,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sx2,
             CAST(sum(x * x * x) AS BIGINT) AS sx3,
             CAST(sum(x * x * x * x) AS BIGINT) AS sx4,
             CAST(sum(n) AS BIGINT) AS sy,
             CAST(sum(x * n) AS BIGINT) AS sxy,
             CAST(sum(x * x * n) AS BIGINT) AS sx2y
      FROM xt)
    {_SELECT}
    FROM mom CROSS JOIN mm
    """,
    tags=("marketing", "diffusion", "regression", "exact-arith"),
)
def q_bass_diffusion_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion fit of the customer adoption curve: per-month new
    adopters regressed on cumulative-penetration percent and its square
    (exact integer moments; shared-text Cramer solve), mapped to the
    innovation/imitation rates and the peak-adoption month
    t* = ln(q/p)/(p+q). On uniform-arrival synthetic data q ~ 0 is
    itself the diagnostic (no imitation dynamics) -- the planted-curve
    pytest proves the estimator recovers a true (p, q) pair."""
    orders = read_table(spark, sf_dir, "orders")
    ad = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("am")
    )
    mm = ad.agg(
        F.min("am").cast("bigint").alias("mn"),
        F.max("am").cast("bigint").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    per = ad.groupBy("am").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    spine = (
        mm.select(F.explode(F.sequence("mn", "mx")).alias("t"))
        .join(per, F.col("t") == F.col("am"), "left")
        .select("t", F.coalesce("n", F.lit(0)).cast("bigint").alias("n"))
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    cum = spine.select(
        "t",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("bigint").alias("nprev"),
    )
    xt = cum.crossJoin(F.broadcast(mm)).selectExpr(
        "t", "n", "(100 * nprev) DIV m AS x"
    )
    mom = xt.agg(
        F.count(F.lit(1)).cast("bigint").alias("tn"),
        F.sum("x").cast("bigint").alias("sx"),
        F.expr("CAST(sum(x * x) AS BIGINT)").alias("sx2"),
        F.expr("CAST(sum(x * x * x) AS BIGINT)").alias("sx3"),
        F.expr("CAST(sum(x * x * x * x) AS BIGINT)").alias("sx4"),
        F.sum("n").cast("bigint").alias("sy"),
        F.expr("CAST(sum(x * n) AS BIGINT)").alias("sxy"),
        F.expr("CAST(sum(x * x * n) AS BIGINT)").alias("sx2y"),
    )
    out = mom.crossJoin(F.broadcast(mm.select("m")))
    return out.selectExpr(
        "tn AS n_months",
        "m AS m_adopters",
        f"round({_COEF_A}, 6) + 0.0 AS coef_a",
        f"round({_COEF_B}, 6) + 0.0 AS coef_b",
        f"round({_COEF_C}, 6) + 0.0 AS coef_c",
        f"round({_P}, 6) + 0.0 AS p_innovation",
        f"round({_Q}, 6) + 0.0 AS q_imitation",
        f"{_PEAK} AS peak_month",
    )
