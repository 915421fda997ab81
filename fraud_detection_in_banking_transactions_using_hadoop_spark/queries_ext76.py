"""Extension batch 76: k-sample rank tests (Kruskal-Wallis, Mood's
median test) and the Cliff's delta effect size.

mann_whitney_u (ext17) answers "are TWO groups different"; these close
the k-sample and effect-size gaps of the nonparametric suite. Shared
discipline: no per-row ranks ever materialize -- grouped counts per
distinct value form the spine, cumulative counts come from
operators/rank.with_global_rank (two-level plan, no single-task
window), and every statistic closes over exact integer sums with ONE
final double step:

- kruskal_wallis: H = 12/(N(N+1)) * sum_g n_g (Rbar_g - (N+1)/2)^2,
  tie-corrected. n_g (Rbar_g - (N+1)/2)^2 = (R2_g - n_g(N+1))^2 /
  (4 n_g) where R2_g is the DOUBLED rank sum (exact int); each group
  term floors to an integer via exact division (error <= 1 per group
  on a ~1e13 sum -- far below round(6), and identical both engines,
  which is what the gate needs).
- moods_median_test: k x 2 contingency of above/<=-global-median;
  chi2 terms (O*N - r*c)^2 / (N*r*c) are e9-rounded integers before
  the cross-group sum (the float-sum-order rule).
- cliffs_delta: #(x>y) - #(x<y) = 2U - n1*n0 exactly from the doubled
  rank sum, so delta and Vargha-Delaney A are single divisions of
  exact integers.

Scale: one groupBy(value) shuffle + the B-row rank plan per query;
group summary tables are 5-7 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Kruskal-Wallis H across the five order priorities.
# ---------------------------------------------------------------------------
@register(
    "kruskal_wallis",
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
      FROM cell cl JOIN ranked r ON cl.v = r.v
      GROUP BY cl.g),
    tot2 AS (
      SELECT (SELECT CAST(sum(ng) AS HUGEINT) FROM per_g) AS n,
             (SELECT CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT)
              FROM spine) AS tie_term),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum((r2 - ng * (t.n + 1)) * (r2 - ng * (t.n + 1))
                      // (4 * ng)) AS HUGEINT) AS s4
      FROM per_g CROSS JOIN tot2 t)
    SELECT CAST(t.n AS BIGINT) AS n_total,
           CAST(tm.k AS INTEGER) AS k_groups,
           round(12.0 / (CAST(t.n AS DOUBLE) * CAST(t.n + 1 AS DOUBLE))
                 * CAST(tm.s4 AS DOUBLE)
                 / (1.0 - CAST(t.tie_term AS DOUBLE)
                    / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                       * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE))), 6)
             AS h_stat,
           round((12.0 / (CAST(t.n AS DOUBLE) * CAST(t.n + 1 AS DOUBLE))
                  * CAST(tm.s4 AS DOUBLE)
                  / (1.0 - CAST(t.tie_term AS DOUBLE)
                     / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                        * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE)))
                  - CAST(tm.k AS DOUBLE) + 1.0)
                 / (CAST(t.n AS DOUBLE) - CAST(tm.k AS DOUBLE)), 6) + 0.0
             AS epsilon_sq
    FROM terms tm CROSS JOIN tot2 t
    """,
    tags=("stats", "nonparametric", "exact-arith"),
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the five order priorities draw order totals from the same
    distribution? Tie-corrected Kruskal-Wallis H over exact doubled
    rank sums: per-(group, value) counts join the value spine's
    exclusive cumulative count (with_global_rank -- no single-task
    window), each group contributes the exact integer
    (R2_g - n_g(N+1))^2 div (4 n_g), and the 5-row combine plus tie
    correction is the only double arithmetic. epsilon_sq is the
    (H - k + 1)/(N - k) effect size."""
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
        F.sum(cd * cd * cd - cd).cast(_DEC).alias("tie_term"),
    )
    dev = F.col("r2") - F.col("ng") * (F.col("n") + F.lit(1).cast(_DEC))
    terms = (
        per_g.crossJoin(F.broadcast(tot))
        .select(F.expr(
            "CAST((r2 - ng * (n + 1)) * (r2 - ng * (n + 1)) DIV (4 * ng)"
            " AS DECIMAL(38,0))"
        ).alias("t4"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.sum("t4").cast(_DEC).alias("s4"),
        )
    )
    _ = dev  # documented identity; the DIV runs in one SQL expr above
    nd = F.col("n").cast("double")
    h = (
        12.0
        / (nd * (F.col("n") + F.lit(1).cast(_DEC)).cast("double"))
        * F.col("s4").cast("double")
        / (
            1.0
            - F.col("tie_term").cast("double") / (nd * nd * nd - nd)
        )
    )
    return terms.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("bigint").alias("n_total"),
        F.col("k").cast("int").alias("k_groups"),
        F.round(h, 6).alias("h_stat"),
        (
            F.round(
                (h - F.col("k").cast("double") + 1.0)
                / (nd - F.col("k").cast("double")),
                6,
            )
            + 0.0
        ).alias("epsilon_sq"),
    )


# ---------------------------------------------------------------------------
# Mood's median test across return-flag classes.
# ---------------------------------------------------------------------------
@register(
    "moods_median_test",
    """
    WITH vals AS (
      SELECT l_returnflag AS g,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v
      FROM lineitem),
    spine AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY v),
    ranked AS (
      SELECT v, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    med AS (
      SELECT min(v) AS m FROM ranked
      WHERE 2 * cc >= (SELECT CAST(sum(c) AS BIGINT) FROM spine)),
    cells AS (
      SELECT g,
             CAST(sum(CASE WHEN v > (SELECT m FROM med) THEN 1 ELSE 0 END)
                  AS BIGINT) AS o_above,
             CAST(count(*) AS BIGINT) AS rg
      FROM vals GROUP BY g),
    tots AS (
      SELECT CAST(sum(o_above) AS BIGINT) AS ca,
             CAST(sum(rg) AS BIGINT) AS n
      FROM cells),
    scored AS (
      SELECT c.g, c.o_above, c.rg - c.o_above AS o_le, c.rg,
             CAST(floor(1e9 *
               (CAST(c.o_above * t.n - c.rg * t.ca AS DOUBLE)
                * CAST(c.o_above * t.n - c.rg * t.ca AS DOUBLE))
               / (CAST(t.n AS DOUBLE) * c.rg * t.ca) + 0.5) AS BIGINT)
               AS term_above_e9,
             CAST(floor(1e9 *
               (CAST((c.rg - c.o_above) * t.n - c.rg * (t.n - t.ca) AS DOUBLE)
                * CAST((c.rg - c.o_above) * t.n - c.rg * (t.n - t.ca)
                       AS DOUBLE))
               / (CAST(t.n AS DOUBLE) * c.rg * (t.n - t.ca)) + 0.5) AS BIGINT)
               AS term_le_e9
      FROM cells c CROSS JOIN tots t)
    SELECT (SELECT CAST(count(*) AS INTEGER) FROM cells) AS k_groups,
           (SELECT round(m / 100.0, 2) FROM med) AS grand_median_dollars,
           round(CAST(sum(term_above_e9 + term_le_e9) AS DOUBLE) / 1e9, 4)
             AS chi2_stat,
           CAST((SELECT count(*) FROM cells) - 1 AS INTEGER) AS dof
    FROM scored
    """,
    tags=("stats", "nonparametric", "exact-arith"),
)
def q_moods_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do return-flag classes differ in median line price? k x 2 contingency of
    above / <= the GRAND median (lower median off the distinct-cent
    spine via with_global_rank -- no single-task window), chi2 with
    expected counts as exact cross-products: each cell's
    (O*N - r*c)^2 / (N*r*c) term is e9-rounded to an integer before
    the cross-group sum (identical doubles both engines feed identical
    floors). The classic robust alternative when a full rank test is
    overkill."""
    li = read_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("v"),
    )
    spine = vals.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ranked = with_global_rank(spine, "v", [F.col("v")], prefix_sum={"cc": "c"})
    ntot = spine.agg(F.sum("c").cast("bigint").alias("nn"))
    med = (
        ranked.crossJoin(F.broadcast(ntot))
        .where(2 * F.col("cc") >= F.col("nn"))
        .agg(F.min("v").alias("m"))
    )
    cells = (
        vals.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.sum(F.when(F.col("v") > F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("o_above"),
            F.count(F.lit(1)).cast("bigint").alias("rg"),
        )
    )
    tots = cells.agg(
        F.sum("o_above").cast("bigint").alias("ca"),
        F.sum("rg").cast("bigint").alias("n"),
    )

    def term_e9(obs, col_tot):
        num = obs * F.col("n") - F.col("rg") * col_tot
        return F.floor(
            F.lit(1e9)
            * (num.cast("double") * num.cast("double"))
            / (F.col("n").cast("double") * F.col("rg") * col_tot)
            + 0.5
        ).cast("bigint")

    scored = cells.crossJoin(F.broadcast(tots)).select(
        "g",
        term_e9(F.col("o_above"), F.col("ca")).alias("term_above_e9"),
        term_e9(F.col("rg") - F.col("o_above"), F.col("n") - F.col("ca")).alias(
            "term_le_e9"
        ),
    )
    kc = cells.agg(F.count(F.lit(1)).cast("int").alias("k_groups"))
    return (
        scored.agg(
            F.round(
                F.sum(F.col("term_above_e9") + F.col("term_le_e9")).cast("double")
                / 1e9,
                4,
            ).alias("chi2_stat")
        )
        .crossJoin(F.broadcast(kc))
        .crossJoin(F.broadcast(med))
        .select(
            "k_groups",
            F.round(F.col("m") / 100.0, 2).alias("grand_median_dollars"),
            "chi2_stat",
            (F.col("k_groups") - 1).cast("int").alias("dof"),
        )
    )


# ---------------------------------------------------------------------------
# Cliff's delta / Vargha-Delaney A for URGENT vs LOW order totals.
# ---------------------------------------------------------------------------
@register(
    "cliffs_delta",
    """
    WITH arms AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS arm,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    spine AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM arms GROUP BY v),
    ranked AS (
      SELECT v, c, c1,
             coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM spine),
    agg AS (
      SELECT CAST(sum(CAST(c1 AS HUGEINT) * (2 * below + c + 1)) AS HUGEINT)
               AS r1_x2,
             CAST(sum(CAST(c1 AS HUGEINT)) AS HUGEINT) AS n1,
             CAST(sum(CAST(c - c1 AS HUGEINT)) AS HUGEINT) AS n0
      FROM ranked),
    d AS (
      SELECT n1, n0,
             r1_x2 - n1 * (n1 + 1) - n1 * n0 AS num2
      FROM agg)
    SELECT CAST(n1 AS BIGINT) AS n_urgent,
           CAST(n0 AS BIGINT) AS n_low,
           round(CAST(num2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)),
                 6) + 0.0 AS cliffs_delta,
           round((CAST(num2 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) + 1.0) / 2.0, 6)
             AS vd_a,
           CASE
             WHEN abs(CAST(num2 AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))) < 0.147
               THEN 'negligible'
             WHEN abs(CAST(num2 AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))) < 0.33
               THEN 'small'
             WHEN abs(CAST(num2 AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))) < 0.474
               THEN 'medium'
             ELSE 'large'
           END AS magnitude
    FROM d
    """,
    tags=("stats", "effect-size", "exact-arith"),
)
def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOW MUCH bigger are URGENT totals than LOW ones (mann_whitney_u
    only says whether)? Cliff's delta = P(X>Y) - P(X<Y) and
    Vargha-Delaney A = P(X>Y) + P(X=Y)/2, both closing over the exact
    integer 2U - n1*n0 = R2_1 - n1(n1+1) - n1*n0 from the doubled
    spine rank sum; the Romano magnitude bands label the result. Two
    exact divisions -- no approximation anywhere."""
    orders = read_table(spark, sf_dir, "orders")
    arms = orders.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("arm"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
    )
    spine = arms.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
    )
    ranked = with_global_rank(spine, "v", [F.col("v")], prefix_sum={"cc": "c"}).select(
        "c", "c1", (F.col("cc") - F.col("c")).alias("below")
    )
    agg = ranked.agg(
        F.sum(
            F.col("c1").cast(_DEC) * (2 * F.col("below") + F.col("c") + 1).cast(_DEC)
        )
        .cast(_DEC)
        .alias("r1_x2"),
        F.sum(F.col("c1").cast(_DEC)).cast(_DEC).alias("n1"),
        F.sum((F.col("c") - F.col("c1")).cast(_DEC)).cast(_DEC).alias("n0"),
    )
    num2 = (
        F.col("r1_x2")
        - F.col("n1") * (F.col("n1") + F.lit(1).cast(_DEC))
        - F.col("n1") * F.col("n0")
    )
    d = agg.select("n1", "n0", num2.alias("num2"))
    delta = F.col("num2").cast("double") / (
        F.col("n1").cast("double") * F.col("n0").cast("double")
    )
    return d.select(
        F.col("n1").cast("bigint").alias("n_urgent"),
        F.col("n0").cast("bigint").alias("n_low"),
        (F.round(delta, 6) + 0.0).alias("cliffs_delta"),
        F.round((delta + 1.0) / 2.0, 6).alias("vd_a"),
        F.when(F.abs(delta) < 0.147, F.lit("negligible"))
        .when(F.abs(delta) < 0.33, F.lit("small"))
        .when(F.abs(delta) < 0.474, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("magnitude"),
    )
