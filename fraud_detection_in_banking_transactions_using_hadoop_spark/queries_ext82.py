"""Extension batch 82: generalized ESD outlier rounds, Hotelling's
T-squared, and quadratic-weighted kappa.

- gesd_outliers: Rosner's generalized extreme studentized deviate --
  FIVE rounds of "find the largest studentized deviation, remove it,
  refit" on the daily revenue series. The single-pass z-score screens
  (mad_outliers, cooks_distance) suffer masking: one huge day inflates
  the SD and hides the second-largest. Each round's argmax compares
  the EXACT integer |n*y - S| (same scale within a round), so removal
  order is engine-stable; only R_i itself divides in double. The
  DuckDB oracle unrolls the same five rounds as CTEs.
- hotelling_t2: the 2-D generalization of welch_t -- do URGENT and
  LOW orders differ in the (line count, total quantity) MEAN VECTOR?
  Pooled within-group covariance from exact n-scaled central moments,
  2x2 inverse in closed form, plus the exact F conversion.
- weighted_kappa_ordinal: Cohen's kappa with quadratic weights
  between two ordinal ratings of each order (priority digit 1..5 vs
  total-price quintile 1..5). kappa_w = 1 - N sum(w O) / sum(w r c)
  is a ratio of EXACT integers; the quintile comes from
  ntile_from_rank on the two-level rank plan (deterministic
  (value, orderkey) total order).
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
_GESD_ROUNDS = 5


def _gesd_sql() -> str:
    parts = [
        """d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate)"""
    ]
    prev = "d"
    outs = []
    for i in range(1, _GESD_ROUNDS + 1):
        parts.append(
            f"""m{i} AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS HUGEINT) AS s,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
      FROM {prev})"""
        )
        parts.append(
            f"""t{i} AS (
      SELECT c.dt, c.y, m.n, m.s, m.s2
      FROM {prev} c CROSS JOIN m{i} m
      ORDER BY abs(m.n * c.y - m.s) DESC, c.dt LIMIT 1)"""
        )
        parts.append(
            f"""c{i} AS (
      SELECT dt, y FROM {prev}
      WHERE dt NOT IN (SELECT dt FROM t{i}))"""
        )
        outs.append(f"SELECT {i} AS round, dt, y, n, s, s2 FROM t{i}")
        prev = f"c{i}"
    union = " UNION ALL ".join(outs)
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    allr AS ({union})
    SELECT CAST(round AS INTEGER) AS round,
           strftime(dt, '%Y-%m-%d') AS dt,
           round(y / 100.0, 2) AS value_dollars,
           round((CAST(abs(n * y - s) AS DOUBLE) / n)
                 / sqrt((CAST(n AS DOUBLE) * s2 - CAST(s AS DOUBLE) * s)
                        / (CAST(n AS DOUBLE) * (n - 1))), 6) AS r_stat
    FROM allr ORDER BY round"""
    )


@register("gesd_outliers", _gesd_sql(), tags=("outlier", "iterative", "exact-arith"))
def q_gesd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five Rosner GESD rounds on daily revenue: per round, the
    studentized extreme R_i = max|y - ybar| / s over the
    SHRINKING set (sample SD, ddof = 1), with the argmax decided on
    the exact integer |n*y - S| and the date tiebreak. Robust to the
    masking that defeats single-pass detectors; the lazy plan unrolls
    the five rounds as anti-joins of 1-row argmax frames (each round's
    moment aggregate broadcasts)."""
    orders = read_table(spark, sf_dir, "orders")
    # r13: the lazy 5-round unroll re-evaluated the whole chain
    # multiplicatively (each round's argmax frame sat in BOTH the final
    # union and every later round's anti-join). Pin the daily spine
    # once and collect each round's single argmax ROW (TakeOrdered, one
    # action per round -- the r8 bounded-state driver fold); the final
    # frame re-enters via createDataFrame with the exact collected
    # BIGINT/DECIMAL values, and r_stat math stays in-engine unchanged.
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("y")
    ).localCheckpoint(eager=True)
    cur = d
    out_rows = []
    for i in range(1, _GESD_ROUNDS + 1):
        mom = cur.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast(_DEC).alias("s"),
            F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("s2"),
        )
        dev = F.abs(F.col("n").cast(_DEC) * F.col("y").cast(_DEC) - F.col("s"))
        top = (
            cur.crossJoin(F.broadcast(mom))
            .orderBy(dev.desc(), "dt")
            .limit(1)
            .select("dt", "y", "n", "s", "s2")
            .first()
        )
        out_rows.append((i, top["dt"], top["y"], top["n"], top["s"], top["s2"]))
        cur = cur.where(F.col("dt") != F.lit(top["dt"]))
    allr = spark.createDataFrame(
        out_rows,
        "round int, dt date, y bigint, n bigint, s decimal(38,0), s2 decimal(38,0)",
    )
    nd = F.col("n").cast("double")
    r_stat = (
        F.abs(F.col("n").cast(_DEC) * F.col("y").cast(_DEC) - F.col("s")).cast("double")
        / F.col("n")
    ) / F.sqrt(
        (nd * F.col("s2").cast("double") - F.col("s").cast("double") * F.col("s"))
        / (nd * (F.col("n") - 1))
    )
    return allr.select(
        F.col("round").cast("int").alias("round"),
        F.date_format("dt", "yyyy-MM-dd").alias("dt"),
        F.round(F.col("y") / 100.0, 2).alias("value_dollars"),
        F.round(r_stat, 6).alias("r_stat"),
    ).orderBy("round")


# ---------------------------------------------------------------------------
# Hotelling's T-squared: 2-D mean-vector comparison URGENT vs LOW.
# ---------------------------------------------------------------------------
@register(
    "hotelling_t2",
    """
    WITH feat AS (
      SELECT o.o_orderkey,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS arm,
             CAST(count(*) AS BIGINT) AS x1,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS x2
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY o.o_orderkey, o.o_orderpriority),
    g AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS HUGEINT) AS sx1,
             CAST(sum(x2) AS HUGEINT) AS sx2,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22
      FROM feat GROUP BY arm),
    c AS (
      SELECT a.n AS n1, b.n AS n0,
             CAST(a.sx1 AS DOUBLE) / a.n - CAST(b.sx1 AS DOUBLE) / b.n AS d1,
             CAST(a.sx2 AS DOUBLE) / a.n - CAST(b.sx2 AS DOUBLE) / b.n AS d2,
             (CAST(a.s11 AS DOUBLE) - CAST(a.sx1 AS DOUBLE) * a.sx1 / a.n
              + CAST(b.s11 AS DOUBLE) - CAST(b.sx1 AS DOUBLE) * b.sx1 / b.n)
               / (a.n + b.n - 2) AS w11,
             (CAST(a.s12 AS DOUBLE) - CAST(a.sx1 AS DOUBLE) * a.sx2 / a.n
              + CAST(b.s12 AS DOUBLE) - CAST(b.sx1 AS DOUBLE) * b.sx2 / b.n)
               / (a.n + b.n - 2) AS w12,
             (CAST(a.s22 AS DOUBLE) - CAST(a.sx2 AS DOUBLE) * a.sx2 / a.n
              + CAST(b.s22 AS DOUBLE) - CAST(b.sx2 AS DOUBLE) * b.sx2 / b.n)
               / (a.n + b.n - 2) AS w22
      FROM (SELECT * FROM g WHERE arm = 1) a
      CROSS JOIN (SELECT * FROM g WHERE arm = 0) b),
    t AS (
      SELECT n1, n0, d1, d2,
             CAST(n1 AS DOUBLE) * n0 / (n1 + n0)
             * (w22 * d1 * d1 - 2.0 * w12 * d1 * d2 + w11 * d2 * d2)
             / (w11 * w22 - w12 * w12) AS t2
      FROM c)
    SELECT n1 AS n_urgent, n0 AS n_low,
           round(d1, 4) + 0.0 AS mean_diff_lines,
           round(d2, 4) + 0.0 AS mean_diff_qty,
           round(t2, 4) AS t2_stat,
           round(CAST(n1 + n0 - 3 AS DOUBLE) / (2.0 * (n1 + n0 - 2)) * t2, 4)
             AS f_stat
    FROM t
    """,
    tags=("stats", "multivariate", "exact-arith"),
)
def q_hotelling_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hotelling's T^2 for the (line count, total quantity) mean
    vector, URGENT vs LOW: pooled within-group covariance from exact
    per-arm integer moments, the 2x2 inverse in closed algebra, and
    the exact F = (n-p-1)/(p(n-2)) T^2 conversion (p = 2). The
    multivariate question 'did the ORDER SHAPE shift' that two
    separate t-tests answer wrongly when the features correlate."""
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    feat = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x1"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("x2"),
        )
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("arm"),
            "x1",
            "x2",
        )
    )
    dd = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    g = feat.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast(_DEC).alias("sx1"),
        F.sum("x2").cast(_DEC).alias("sx2"),
        F.sum(dd("x1") * dd("x1")).cast(_DEC).alias("s11"),
        F.sum(dd("x1") * dd("x2")).cast(_DEC).alias("s12"),
        F.sum(dd("x2") * dd("x2")).cast(_DEC).alias("s22"),
    )
    a = g.where(F.col("arm") == 1).alias("a")
    b = g.where(F.col("arm") == 0).alias("b")

    def w(sa, xa, ya, sb, xb, yb):
        return (
            F.col(f"a.{sa}").cast("double")
            - F.col(f"a.{xa}").cast("double") * F.col(f"a.{ya}") / F.col("a.n")
            + F.col(f"b.{sb}").cast("double")
            - F.col(f"b.{xb}").cast("double") * F.col(f"b.{yb}") / F.col("b.n")
        ) / (F.col("a.n") + F.col("b.n") - 2)

    c = a.crossJoin(F.broadcast(b)).select(
        F.col("a.n").alias("n1"),
        F.col("b.n").alias("n0"),
        (
            F.col("a.sx1").cast("double") / F.col("a.n")
            - F.col("b.sx1").cast("double") / F.col("b.n")
        ).alias("d1"),
        (
            F.col("a.sx2").cast("double") / F.col("a.n")
            - F.col("b.sx2").cast("double") / F.col("b.n")
        ).alias("d2"),
        w("s11", "sx1", "sx1", "s11", "sx1", "sx1").alias("w11"),
        w("s12", "sx1", "sx2", "s12", "sx1", "sx2").alias("w12"),
        w("s22", "sx2", "sx2", "s22", "sx2", "sx2").alias("w22"),
    )
    t2 = (
        F.col("n1").cast("double") * F.col("n0") / (F.col("n1") + F.col("n0"))
        * (
            F.col("w22") * F.col("d1") * F.col("d1")
            - 2.0 * F.col("w12") * F.col("d1") * F.col("d2")
            + F.col("w11") * F.col("d2") * F.col("d2")
        )
        / (F.col("w11") * F.col("w22") - F.col("w12") * F.col("w12"))
    )
    t = c.select("n1", "n0", "d1", "d2", t2.alias("t2"))
    return t.select(
        F.col("n1").alias("n_urgent"),
        F.col("n0").alias("n_low"),
        (F.round("d1", 4) + 0.0).alias("mean_diff_lines"),
        (F.round("d2", 4) + 0.0).alias("mean_diff_qty"),
        F.round("t2", 4).alias("t2_stat"),
        F.round(
            (F.col("n1") + F.col("n0") - 3).cast("double")
            / (2.0 * (F.col("n1") + F.col("n0") - 2))
            * F.col("t2"),
            4,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Quadratic-weighted kappa: priority digit vs total-price quintile.
# ---------------------------------------------------------------------------
@register(
    "weighted_kappa_ordinal",
    """
    WITH base AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS ra,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
             o_orderkey AS ok
      FROM orders),
    ranked AS (
      SELECT ra, CAST(ntile(5) OVER (ORDER BY v, ok) AS BIGINT) AS rb
      FROM base),
    o AS (
      SELECT ra, rb, CAST(count(*) AS BIGINT) AS obs
      FROM ranked GROUP BY ra, rb),
    margins AS (
      SELECT CAST(sum(obs) AS BIGINT) AS n FROM o),
    ra_m AS (SELECT ra, CAST(sum(obs) AS BIGINT) AS r FROM o GROUP BY ra),
    rb_m AS (SELECT rb, CAST(sum(obs) AS BIGINT) AS c FROM o GROUP BY rb),
    num AS (
      SELECT CAST(sum((ra - rb) * (ra - rb) * CAST(obs AS HUGEINT))
                  AS HUGEINT) AS swo
      FROM o),
    den AS (
      SELECT CAST(sum((a.ra - b.rb) * (a.ra - b.rb)
                      * CAST(a.r AS HUGEINT) * b.c) AS HUGEINT) AS swrc
      FROM ra_m a CROSS JOIN rb_m b)
    SELECT m.n AS n_orders,
           round(1.0 - CAST(m.n AS DOUBLE) * nu.swo / CAST(de.swrc AS DOUBLE),
                 6) + 0.0 AS weighted_kappa
    FROM margins m CROSS JOIN num nu CROSS JOIN den de
    """,
    tags=("stats", "agreement", "exact-arith"),
)
def q_weighted_kappa_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic-weighted Cohen's kappa between the order's priority
    digit (1..5) and its total-price quintile (1..5): kappa_w =
    1 - N sum(w_ij O_ij) / sum(w_ij r_i c_j) with w = (i-j)^2 is a
    ratio of EXACT integers -- disagreement costs grow with ordinal
    distance, which plain cohens_kappa ignores. The quintile is
    ntile_from_rank on the two-level rank plan over the deterministic
    (price, orderkey) total order; the 5x5 margins cross join is
    constant-size."""
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("ra"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
        F.col("o_orderkey").alias("ok"),
    )
    tot = base.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    ranked = (
        with_global_rank(base, "v", [F.col("v"), F.col("ok")])
        .crossJoin(F.broadcast(tot))
        .select(
            "ra",
            ntile_from_rank(F.col("global_rank"), F.col("nn"), 5)
            .cast("bigint")
            .alias("rb"),
        )
    )
    o = ranked.groupBy("ra", "rb").agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    margins = o.agg(F.sum("obs").cast("bigint").alias("n"))
    ra_m = o.groupBy("ra").agg(F.sum("obs").cast("bigint").alias("r"))
    rb_m = o.groupBy("rb").agg(F.sum("obs").cast("bigint").alias("c"))
    num = o.agg(
        F.sum(
            ((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))).cast(_DEC)
            * F.col("obs").cast(_DEC)
        )
        .cast(_DEC)
        .alias("swo")
    )
    den = (
        ra_m.crossJoin(F.broadcast(rb_m))
        .agg(
            F.sum(
                ((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))).cast(_DEC)
                * F.col("r").cast(_DEC)
                * F.col("c").cast(_DEC)
            )
            .cast(_DEC)
            .alias("swrc")
        )
    )
    return (
        margins.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .select(
            F.col("n").alias("n_orders"),
            (
                F.round(
                    1.0
                    - F.col("n").cast("double")
                    * F.col("swo")
                    / F.col("swrc").cast("double"),
                    6,
                )
                + 0.0
            ).alias("weighted_kappa"),
        )
    )
