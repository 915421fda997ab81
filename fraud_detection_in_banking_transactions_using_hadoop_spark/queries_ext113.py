"""Extension batch 113: shifted-beta-geometric retention, the Sargan
over-identification test, and the Shorrocks mobility index.

- sbg_retention_projection: Fader-Hardie's sBG model says customers
  churn with heterogeneous beta-distributed probabilities; its two
  parameters have a CLOSED method-of-moments form from just the
  first two retention rates (alpha = beta (1-r1)/r1, beta =
  r1(1-r2)/(r2-r1)), and then every future year's retention is
  (beta+t-1)/(alpha+beta+t-1). Fitted on the earliest cohort's exact
  survival counts, projected to years 4-6 and checked against the
  observed year-4 rate.
- sargan_overid_test: hausman_ols_iv trusted ONE instrument; with
  nation parity AND nation-pair parity as two instruments for one
  endogenous regressor, the Sargan J = n R^2 of the 2SLS residual on
  the instruments tests whether the instruments AGREE. All binary
  moments are exact counts.
- shorrocks_mobility_index: the one-number summary of the quartile
  transition matrix M = (k - trace)/(k - 1): 0 = frozen ranks, 1 =
  independence-level churn; exact integer trace over the same
  grouped-rank quartiles bowker_symmetry_test uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import (
    ntile_from_rank,
    with_global_rank,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Shifted-beta-geometric retention fit + projection.
# ---------------------------------------------------------------------------
@register(
    "sbg_retention_projection",
    """
    WITH cohort AS (
      SELECT o_custkey AS ck, min(date_part('year', o_orderdate)) AS fy
      FROM orders GROUP BY o_custkey),
    cy AS (SELECT CAST(max(date_part('year', o_orderdate)) - 3 AS BIGINT)
             AS y0 FROM orders),
    c93 AS (SELECT ck FROM cohort, cy WHERE fy = y0),
    lasty AS (
      SELECT o_custkey AS ck, CAST(max(date_part('year', o_orderdate))
                                   AS BIGINT) AS ly
      FROM orders GROUP BY o_custkey),
    surv AS (
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM c93) AS n0,
        (SELECT CAST(count(*) AS BIGINT) FROM c93 c
         JOIN lasty l ON l.ck = c.ck, cy WHERE l.ly >= y0 + 1) AS n1,
        (SELECT CAST(count(*) AS BIGINT) FROM c93 c
         JOIN lasty l ON l.ck = c.ck, cy WHERE l.ly >= y0 + 2) AS n2,
        (SELECT CAST(count(*) AS BIGINT) FROM c93 c
         JOIN lasty l ON l.ck = c.ck, cy WHERE l.ly >= y0 + 3) AS n3),
    fit AS (
      SELECT n0, n1, n2, n3,
             CAST(n1 AS DOUBLE) / n0 AS r1,
             CAST(n2 AS DOUBLE) / n1 AS r2
      FROM surv),
    ab AS (
      SELECT n0, n1, n2, n3, r1, r2,
             r1 * (1.0 - r2) / (r2 - r1) AS beta,
             (r1 * (1.0 - r2) / (r2 - r1)) * (1.0 - r1) / r1 AS alpha
      FROM fit)
    SELECT n0 AS cohort_size,
           round(alpha, 4) + 0.0 AS sbg_alpha,
           round(beta, 4) + 0.0 AS sbg_beta,
           round(r1, 6) AS observed_r1,
           round(r2, 6) AS observed_r2,
           round(CAST(n3 AS DOUBLE) / n2, 6) AS observed_r3,
           round((beta + 2.0) / (alpha + beta + 2.0), 6) AS sbg_pred_r3,
           round((beta + 3.0) / (alpha + beta + 3.0), 6) AS sbg_pred_r4
    FROM ab
    """,
    tags=("retention", "sbg", "exact-arith"),
)
def q_sbg_retention_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fader-Hardie shifted-beta-geometric retention for the max-year-minus-3
    first-order cohort (dynamic, with three observable renewal years): survival counts n_t = customers still active
    in year t or later (exact EXISTS semantics), the closed
    method-of-moments alpha/beta from r1 and r2 alone, and the model
    projection r_t = (beta+t-1)/(alpha+beta+t-1) for years 3-4
    against the OBSERVED year-3 rate -- the out-of-sample check that
    makes the fit falsifiable. sBG's signature: retention RISES with
    tenure as the churners filter out."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    cohort = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.min(F.year("o_orderdate")).alias("fy")
    )
    cy = orders.agg(
        (F.max(F.year("o_orderdate")) - 3).cast("bigint").alias("y0")
    )
    c93 = cohort.crossJoin(F.broadcast(cy)).where(
        F.col("fy") == F.col("y0")
    ).select("ck", "y0")
    last = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max(F.year("o_orderdate")).cast("bigint").alias("ly")
    )
    j = c93.join(last, "ck")
    surv = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("ly") >= F.col("y0") + 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("ly") >= F.col("y0") + 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("ly") >= F.col("y0") + 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n3"),
    )
    r1 = F.col("n1").cast("double") / F.col("n0")
    r2 = F.col("n2").cast("double") / F.col("n1")
    beta = r1 * (1.0 - r2) / (r2 - r1)
    alpha = beta * (1.0 - r1) / r1
    ab = surv.select(
        "n0", "n1", "n2", "n3",
        r1.alias("r1"), r2.alias("r2"),
        beta.alias("beta"), alpha.alias("alpha"),
    )
    return ab.select(
        F.col("n0").alias("cohort_size"),
        (F.round("alpha", 4) + 0.0).alias("sbg_alpha"),
        (F.round("beta", 4) + 0.0).alias("sbg_beta"),
        F.round("r1", 6).alias("observed_r1"),
        F.round("r2", 6).alias("observed_r2"),
        F.round(F.col("n3").cast("double") / F.col("n2"), 6).alias(
            "observed_r3"
        ),
        F.round(
            (F.col("beta") + 2.0) / (F.col("alpha") + F.col("beta") + 2.0), 6
        ).alias("sbg_pred_r3"),
        F.round(
            (F.col("beta") + 3.0) / (F.col("alpha") + F.col("beta") + 3.0), 6
        ).alias("sbg_pred_r4"),
    )


# ---------------------------------------------------------------------------
# Sargan over-identification test with two instruments.
# ---------------------------------------------------------------------------
@register(
    "sargan_overid_test",
    """
    WITH base AS (
      SELECT c.c_nationkey % 2 AS z1, (c.c_nationkey // 2) % 2 AS z2,
             CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS x,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(z1) AS BIGINT) AS s1, CAST(sum(z2) AS BIGINT) AS s2v,
             CAST(sum(z1 * z2) AS BIGINT) AS s12,
             CAST(sum(z1 * x) AS BIGINT) AS s1x,
             CAST(sum(z2 * x) AS BIGINT) AS s2x,
             CAST(sum(z1 * y) AS BIGINT) AS s1y,
             CAST(sum(z2 * y) AS BIGINT) AS s2y,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM base),
    c2 AS (
      SELECT n,
             CAST(n * s1 - s1 * s1 AS DOUBLE) AS c11,
             CAST(n * s12 - s1 * s2v AS DOUBLE) AS c12,
             CAST(n * s2v - s2v * s2v AS DOUBLE) AS c22,
             CAST(n * s1x - s1 * sx AS DOUBLE) AS c1x,
             CAST(n * s2x - s2v * sx AS DOUBLE) AS c2x,
             CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
             CAST(n * s2y - s2v * sy AS DOUBLE) AS c2y,
             CAST(n * sx - sx * sx AS DOUBLE) AS cxx,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
             CAST(n * sy - sy * sy AS DOUBLE) AS cyy
      FROM mom),
    tsls AS (
      SELECT c2.*,
             (c22 * c1x - c12 * c2x) / (c11 * c22 - c12 * c12) AS g1,
             (c11 * c2x - c12 * c1x) / (c11 * c22 - c12 * c12) AS g2
      FROM c2),
    est AS (
      SELECT tsls.*,
             (g1 * c1y + g2 * c2y) / (g1 * c1x + g2 * c2x) AS b
      FROM tsls),
    sargan AS (
      SELECT n, b,
             ((c22 * (c1y - b * c1x) - c12 * (c2y - b * c2x))
                * (c1y - b * c1x)
              + (c11 * (c2y - b * c2x) - c12 * (c1y - b * c1x))
                * (c2y - b * c2x))
               / (c11 * c22 - c12 * c12)
               / (cyy - 2.0 * b * cxy + b * b * cxx) * n AS j
      FROM est)
    SELECT n AS n_lines,
           round(b, 6) + 0.0 AS beta_2sls,
           round(j, 4) AS sargan_j,
           CAST(1 AS INTEGER) AS dof
    FROM sargan
    """,
    tags=("econometrics", "overidentification", "exact-arith"),
)
def q_sargan_overid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sargan J with two instruments (nation parity z1, nation-pair
    parity z2) for the discount -> return effect: the 2SLS slope
    from the first-stage projection coefficients, residual-instrument
    covariances in closed form (no residual row ever materializes),
    and J = n R^2(e on z) with 1 overidentifying restriction. A
    large J means the two instruments tell DIFFERENT causal stories
    -- the sanity check one-instrument designs can't run."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_discount", "l_returnflag"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .select(
            (F.col("c_nationkey") % 2).alias("z1"),
            F.expr("(c_nationkey DIV 2) % 2").alias("z2"),
            F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("x"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z1").cast("bigint").alias("s1"),
        F.sum("z2").cast("bigint").alias("s2v"),
        F.sum(F.col("z1") * F.col("z2")).cast("bigint").alias("s12"),
        F.sum(F.col("z1") * F.col("x")).cast("bigint").alias("s1x"),
        F.sum(F.col("z2") * F.col("x")).cast("bigint").alias("s2x"),
        F.sum(F.col("z1") * F.col("y")).cast("bigint").alias("s1y"),
        F.sum(F.col("z2") * F.col("y")).cast("bigint").alias("s2y"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast(_DEC)

    def cc(sab, sa, sb):
        return (nd * F.col(sab) - F.col(sa).cast(_DEC) * F.col(sb)).cast("double")

    c2 = mom.select(
        "n",
        cc("s1", "s1", "s1").alias("c11_raw"),
        (nd * F.col("s1") - F.col("s1").cast(_DEC) * F.col("s1")).cast("double").alias("c11"),
        (nd * F.col("s12") - F.col("s1").cast(_DEC) * F.col("s2v")).cast("double").alias("c12"),
        (nd * F.col("s2v") - F.col("s2v").cast(_DEC) * F.col("s2v")).cast("double").alias("c22"),
        (nd * F.col("s1x") - F.col("s1").cast(_DEC) * F.col("sx")).cast("double").alias("c1x"),
        (nd * F.col("s2x") - F.col("s2v").cast(_DEC) * F.col("sx")).cast("double").alias("c2x"),
        (nd * F.col("s1y") - F.col("s1").cast(_DEC) * F.col("sy")).cast("double").alias("c1y"),
        (nd * F.col("s2y") - F.col("s2v").cast(_DEC) * F.col("sy")).cast("double").alias("c2y"),
        (nd * F.col("sx") - F.col("sx").cast(_DEC) * F.col("sx")).cast("double").alias("cxx"),
        (nd * F.col("sxy") - F.col("sx").cast(_DEC) * F.col("sy")).cast("double").alias("cxy"),
        (nd * F.col("sy") - F.col("sy").cast(_DEC) * F.col("sy")).cast("double").alias("cyy"),
    ).drop("c11_raw")
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    g1 = (F.col("c22") * F.col("c1x") - F.col("c12") * F.col("c2x")) / det
    g2 = (F.col("c11") * F.col("c2x") - F.col("c12") * F.col("c1x")) / det
    b = (g1 * F.col("c1y") + g2 * F.col("c2y")) / (
        g1 * F.col("c1x") + g2 * F.col("c2x")
    )
    est = c2.select(
        "n", "c11", "c12", "c22", "c1y", "c2y", "cyy", "cxy", "cxx",
        "c1x", "c2x", b.alias("b"),
    )
    e1 = F.col("c1y") - F.col("b") * F.col("c1x")
    e2 = F.col("c2y") - F.col("b") * F.col("c2x")
    cee = (
        F.col("cyy")
        - 2.0 * F.col("b") * F.col("cxy")
        + F.col("b") * F.col("b") * F.col("cxx")
    )
    jstat = (
        (
            (F.col("c22") * e1 - F.col("c12") * e2) * e1
            + (F.col("c11") * e2 - F.col("c12") * e1) * e2
        )
        / (F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12"))
        / cee
        * F.col("n")
    )
    return est.select(
        F.col("n").alias("n_lines"),
        (F.round("b", 6) + 0.0).alias("beta_2sls"),
        F.round(jstat, 4).alias("sargan_j"),
        F.lit(1).cast("int").alias("dof"),
    )


# ---------------------------------------------------------------------------
# Shorrocks mobility index of the quartile transition matrix.
# ---------------------------------------------------------------------------
@register(
    "shorrocks_mobility_index",
    """
    WITH spend AS (
      SELECT o_custkey AS ck, date_part('year', o_orderdate) AS yr,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS s
      FROM orders WHERE date_part('year', o_orderdate) IN (1996, 1997)
      GROUP BY o_custkey, date_part('year', o_orderdate)),
    q AS (
      SELECT ck, yr, ntile(4) OVER (PARTITION BY yr ORDER BY s, ck) AS tile
      FROM spend),
    matched AS (
      SELECT a.tile AS q0, b.tile AS q1
      FROM (SELECT * FROM q WHERE yr = 1996) a
      JOIN (SELECT * FROM q WHERE yr = 1997) b ON a.ck = b.ck),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN q0 = q1 THEN 1 ELSE 0 END) AS BIGINT) AS stay
      FROM matched),
    rowp AS (
      SELECT q0, CAST(count(*) AS BIGINT) AS nr,
             CAST(sum(CASE WHEN q0 = q1 THEN 1 ELSE 0 END) AS BIGINT) AS diag
      FROM matched GROUP BY q0),
    tr AS (
      SELECT CAST(sum(CAST(floor(1e9 * (CAST(diag AS DOUBLE) / nr) + 0.5)
                           AS BIGINT)) AS HUGEINT) AS trace_e9
      FROM rowp)
    SELECT (SELECT n FROM agg) AS n_matched,
           round((SELECT CAST(stay AS DOUBLE) / n FROM agg), 6) AS stay_share,
           round((4.0 - CAST((SELECT trace_e9 FROM tr) AS DOUBLE) / 1e9)
                 / 3.0, 6) AS shorrocks_m
    """,
    tags=("econ", "mobility", "exact-arith"),
)
def q_shorrocks_mobility_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shorrocks mobility M = (k - trace(P))/(k-1) of the 1996->1997
    spend-quartile transition matrix (the same deterministic
    grouped-rank quartiles as bowker_symmetry_test): each diagonal
    transition probability e9-floored before the 4-term trace. M = 0
    freezes everyone in rank; M = 1 matches independent redraws --
    the single number 'how sticky is customer rank'."""
    orders = read_table(spark, sf_dir, "orders")
    spend = (
        orders.where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(
            F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("yr")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("s")
        )
    )
    totals = spend.groupBy("yr").agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    ranked = (
        with_global_rank(
            spend, "s", [F.col("s"), F.col("ck")], partition_cols=["yr"]
        )
        .join(F.broadcast(totals), "yr")
        .select(
            "ck",
            "yr",
            ntile_from_rank(F.col("global_rank"), F.col("nn"), 4).alias("tile"),
        )
    )
    a = ranked.where(F.col("yr") == 1996).select("ck", F.col("tile").alias("q0"))
    b = ranked.where(F.col("yr") == 1997).select(
        F.col("ck").alias("ck2"), F.col("tile").alias("q1")
    )
    matched = a.join(b, a.ck == b.ck2).select("q0", "q1")
    agg = matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("q0") == F.col("q1"), 1).otherwise(0))
        .cast("bigint")
        .alias("stay"),
    )
    rowp = matched.groupBy("q0").agg(
        F.count(F.lit(1)).cast("bigint").alias("nr"),
        F.sum(F.when(F.col("q0") == F.col("q1"), 1).otherwise(0))
        .cast("bigint")
        .alias("diag"),
    )
    tr = rowp.agg(
        F.sum(
            F.floor(
                F.lit(1e9) * (F.col("diag").cast("double") / F.col("nr")) + 0.5
            ).cast("bigint")
        )
        .cast(_DEC)
        .alias("trace_e9")
    )
    return agg.crossJoin(F.broadcast(tr)).select(
        F.col("n").alias("n_matched"),
        F.round(F.col("stay").cast("double") / F.col("n"), 6).alias("stay_share"),
        F.round(
            (4.0 - F.col("trace_e9").cast("double") / 1e9) / 3.0, 6
        ).alias("shorrocks_m"),
    )
