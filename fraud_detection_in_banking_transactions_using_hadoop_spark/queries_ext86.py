"""Extension batch 86: Dunn's post-hoc pairs (the rank analogue of
Tukey HSD), Page's trend test (ordered treatments over blocks), and
the von Neumann ratio.

- dunn_posthoc_pairs: AFTER kruskal_wallis rejects, WHICH priorities
  differ? z_ab = (Rbar_a - Rbar_b) / sqrt((N(N+1)/12 - T)(1/n_a +
  1/n_b)) with the tie correction T = sum(t^3 - t)/(12(N-1)); mean
  ranks come from the same doubled-rank-sum spine as kruskal_wallis,
  so everything up to the final division is exact integers.
- page_trend_test: Page's L for the ordered alternative ACROSS blocks
  -- rank the five priorities within each year by average order value
  (a 15-cell table), L = sum over blocks of sum j * rank_j; exact
  E[L] = b k (k+1)^2 / 4 and Var = b k^2 (k+1)(k^2-1)/144. The
  repeated-measures cousin of jonckheere_terpstra.
- von_neumann_ratio: eta = sum (y_t - y_{t-1})^2 / sum (y - ybar)^2
  on daily revenue -- the classic mean-square-successive-difference
  randomness screen (eta ~ 2 under independence); exact via the
  cross-multiplied integer form n * SSD / (n S2 - S^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_PAGE_YEARS = (1995, 1996, 1997)


# ---------------------------------------------------------------------------
# Dunn's test: pairwise mean-rank contrasts after Kruskal-Wallis.
# ---------------------------------------------------------------------------
@register(
    "dunn_posthoc_pairs",
    """
    WITH vals AS (
      SELECT o_orderpriority AS g,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders),
    cell AS (
      SELECT g, v, CAST(count(*) AS BIGINT) AS cg FROM vals GROUP BY g, v),
    spine AS (
      SELECT v, CAST(sum(cg) AS BIGINT) AS c FROM cell GROUP BY v),
    ranked AS (
      SELECT v, c,
             coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM spine),
    per_g AS (
      SELECT cl.g,
             CAST(sum(cl.cg) AS HUGEINT) AS ng,
             CAST(sum(CAST(cl.cg AS HUGEINT) * (2 * r.below + r.c + 1))
                  AS HUGEINT) AS r2
      FROM cell cl JOIN ranked r ON cl.v = r.v GROUP BY cl.g),
    tot AS (
      SELECT (SELECT CAST(sum(c) AS HUGEINT) FROM spine) AS n,
             (SELECT CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT)
              FROM spine) AS tie3),
    pairs AS (
      SELECT a.g AS g1, b.g AS g2,
             CAST(a.r2 AS DOUBLE) / (2.0 * a.ng)
               - CAST(b.r2 AS DOUBLE) / (2.0 * b.ng) AS drbar,
             sqrt((CAST(t.n AS DOUBLE) * (t.n + 1) / 12.0
                   - CAST(t.tie3 AS DOUBLE) / (12.0 * (t.n - 1)))
                  * (1.0 / a.ng + 1.0 / b.ng)) AS se
      FROM per_g a JOIN per_g b ON a.g < b.g CROSS JOIN tot t)
    SELECT g1 AS group_a, g2 AS group_b,
           round(drbar, 4) + 0.0 AS mean_rank_diff,
           round(drbar / se, 6) + 0.0 AS dunn_z
    FROM pairs ORDER BY g1, g2
    """,
    tags=("stats", "posthoc", "exact-arith"),
)
def q_dunn_posthoc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's pairwise z for all 10 priority pairs on the
    kruskal_wallis spine: mean ranks from exact doubled rank sums,
    pooled-rank variance N(N+1)/12 minus the tie correction
    sum(t^3 - t)/(12(N-1)), both exact integers until the final
    division. The rank-scale answer to 'which groups moved' that
    tukey_hsd_contrasts gives on the mean scale."""
    orders = read_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
    )
    cell = vals.groupBy("g", "v").agg(F.count(F.lit(1)).cast("bigint").alias("cg"))
    spine = cell.groupBy("v").agg(F.sum("cg").cast("bigint").alias("c"))
    ranked = with_global_rank(spine, "v", [F.col("v")], prefix_sum={"cc": "c"}).select(
        "v", "c", (F.col("cc") - F.col("c")).alias("below")
    )
    per_g = (
        cell.join(ranked, "v")
        .groupBy("g")
        .agg(
            F.sum("cg").cast(_DEC).alias("ng"),
            F.sum(
                F.col("cg").cast(_DEC)
                * (2 * F.col("below") + F.col("c") + 1).cast(_DEC)
            )
            .cast(_DEC)
            .alias("r2"),
        )
    )
    cd = F.col("c").cast(_DEC)
    tot = spine.agg(
        F.sum("c").cast(_DEC).alias("n"),
        F.sum(cd * cd * cd - cd).cast(_DEC).alias("tie3"),
    )
    a, b = per_g.alias("a"), per_g.alias("b")
    drbar = F.col("a.r2").cast("double") / (2.0 * F.col("a.ng")) - F.col(
        "b.r2"
    ).cast("double") / (2.0 * F.col("b.ng"))
    se = F.sqrt(
        (
            F.col("n").cast("double") * (F.col("n") + 1).cast("double") / 12.0
            - F.col("tie3").cast("double") / (12.0 * (F.col("n") - 1).cast("double"))
        )
        * (1.0 / F.col("a.ng") + 1.0 / F.col("b.ng"))
    )
    pairs = (
        a.join(F.broadcast(b), F.col("a.g") < F.col("b.g"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a.g").alias("g1"),
            F.col("b.g").alias("g2"),
            drbar.alias("drbar"),
            se.alias("se"),
        )
    )
    return pairs.select(
        F.col("g1").alias("group_a"),
        F.col("g2").alias("group_b"),
        (F.round("drbar", 4) + 0.0).alias("mean_rank_diff"),
        (F.round(F.col("drbar") / F.col("se"), 6) + 0.0).alias("dunn_z"),
    ).orderBy("group_a", "group_b")


# ---------------------------------------------------------------------------
# Page's trend test across year blocks.
# ---------------------------------------------------------------------------
@register(
    "page_trend_test",
    f"""
    WITH cells AS (
      SELECT date_part('year', o_orderdate) AS yr,
             CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS j,
             CAST(sum(round(o_totalprice * 100, 0)) AS HUGEINT) AS s,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders
      WHERE date_part('year', o_orderdate) IN {_PAGE_YEARS}
      GROUP BY yr, CAST(substr(o_orderpriority, 1, 1) AS BIGINT)),
    rk AS (
      SELECT yr, j,
             CAST(row_number() OVER (PARTITION BY yr
               ORDER BY CAST(s AS DOUBLE) / cnt, j) AS BIGINT) AS r
      FROM cells),
    l AS (
      SELECT CAST(sum(j * r) AS BIGINT) AS lstat,
             CAST(count(DISTINCT yr) AS BIGINT) AS b,
             CAST(max(j) AS BIGINT) AS k
      FROM rk)
    SELECT lstat AS page_l,
           CAST(b AS INTEGER) AS n_blocks,
           CAST(k AS INTEGER) AS k_treatments,
           CAST(b * k * (k + 1) * (k + 1) AS DOUBLE) / 4.0 AS expected_l,
           round((CAST(lstat AS DOUBLE)
                  - CAST(b * k * (k + 1) * (k + 1) AS DOUBLE) / 4.0)
                 / sqrt(CAST(b * k * k * (k + 1) AS DOUBLE)
                        * (k * k - 1) / 144.0), 4) + 0.0 AS z_score
    FROM l
    """,
    tags=("stats", "trend", "exact-arith"),
)
def q_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L: within each year block, rank the five priorities by
    average order value (15-cell table; ties broken by priority index
    -- the averages are identical doubles from exact integer sums both
    engines), then L = sum j * rank_j. Against E[L] = b k (k+1)^2/4
    with Var = b k^2 (k+1)(k^2-1)/144, a significant z means the
    priority ordering aligns with order value CONSISTENTLY across
    years -- the blocked version of jonckheere_terpstra."""
    orders = read_table(spark, sf_dir, "orders")
    cells = (
        orders.where(F.year("o_orderdate").isin(*_PAGE_YEARS))
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("j"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast(_DEC).alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    w = Window.partitionBy("yr").orderBy(
        F.col("s").cast("double") / F.col("cnt"), "j"
    )
    rk = cells.select("yr", "j", F.row_number().over(w).cast("bigint").alias("r"))
    l = rk.agg(
        F.sum(F.col("j") * F.col("r")).cast("bigint").alias("lstat"),
        F.countDistinct("yr").cast("bigint").alias("b"),
        F.max("j").cast("bigint").alias("k"),
    )
    e = (F.col("b") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1)).cast(
        "double"
    ) / 4.0
    var = (
        (F.col("b") * F.col("k") * F.col("k") * (F.col("k") + 1)).cast("double")
        * (F.col("k") * F.col("k") - 1)
        / 144.0
    )
    return l.select(
        F.col("lstat").alias("page_l"),
        F.col("b").cast("int").alias("n_blocks"),
        F.col("k").cast("int").alias("k_treatments"),
        e.alias("expected_l"),
        (F.round((F.col("lstat").cast("double") - e) / F.sqrt(var), 4) + 0.0).alias(
            "z_score"
        ),
    )


# ---------------------------------------------------------------------------
# Von Neumann ratio of daily revenue.
# ---------------------------------------------------------------------------
@register(
    "von_neumann_ratio",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate),
    lagged AS (
      SELECT y, lag(y) OVER (ORDER BY dt) AS yp FROM d),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS sy2,
             CAST(sum(CASE WHEN yp IS NULL THEN 0
                           ELSE CAST(y - yp AS HUGEINT) * (y - yp) END)
                  AS HUGEINT) AS ssd
      FROM lagged)
    SELECT n AS n_days,
           round(CAST(n AS DOUBLE) * ssd
                 / CAST(n * sy2 - sy * sy AS DOUBLE), 6) AS vn_ratio,
           round((CAST(n AS DOUBLE) * ssd
                  / CAST(n * sy2 - sy * sy AS DOUBLE) - 2.0)
                 * sqrt((CAST(n AS DOUBLE) * n - 1.0)
                        / (4.0 * (CAST(n AS DOUBLE) - 2.0))), 4) + 0.0
             AS z_score
    FROM s
    """,
    tags=("timeseries", "randomness", "exact-arith"),
)
def q_von_neumann_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Von Neumann ratio eta = sum of squared successive differences
    over the centered sum of squares for daily revenue: the
    cross-multiplied integer form n * SSD / (n S2 - S^2) is exact
    until ONE double division; z = (eta - 2) sqrt((n^2-1)/(4(n-2))).
    eta < 2 flags positive day-to-day persistence (trend/level
    shifts), eta > 2 oscillation -- the raw-series sibling of
    durbin_watson (which tests the residuals)."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("y")
    )
    lagged = d.select("y", F.lag("y").over(Window.orderBy("dt")).alias("yp"))
    dd = (F.col("y") - F.col("yp")).cast(_DEC)
    s = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("sy2"),
        F.sum(F.when(F.col("yp").isNull(), F.lit(0).cast(_DEC)).otherwise(dd * dd))
        .cast(_DEC)
        .alias("ssd"),
    )
    nd = F.col("n").cast("double")
    eta = nd * F.col("ssd").cast("double") / (
        F.col("n").cast(_DEC) * F.col("sy2") - F.col("sy") * F.col("sy")
    ).cast("double")
    return s.select(
        F.col("n").alias("n_days"),
        F.round(eta, 6).alias("vn_ratio"),
        (
            F.round(
                (eta - 2.0) * F.sqrt((nd * F.col("n") - 1.0) / (4.0 * (nd - 2.0))),
                4,
            )
            + 0.0
        ).alias("z_score"),
    )
