"""Extension batch 83: variance-homogeneity tests (Brown-Forsythe,
Bartlett) and the ordered-alternative Jonckheere-Terpstra test.

anova_dow_revenue compares MEANS assuming equal variances; these are
the tests that check (BF/Bartlett) or exploit (JT) what ANOVA
assumes away:

- brown_forsythe: ANOVA-F on |x - group MEDIAN| -- the robust Levene
  variant. Medians are exact per-group order statistics off the
  GROUPED two-level rank plan; the F numerator/denominator close over
  exact integer dollar sums via the floor-division identity
  (error <= 1 per group on ~1e15 sums, identical both engines).
- bartlett_test: the parametric counterpart; each group's
  (n_g - 1) ln s_g^2 term and each 1/(n_g - 1) term is floored to an
  e6/e15 integer before the cross-group sum (float-sum-order rule).
- jonckheere_terpstra: are order totals stochastically INCREASING in
  priority 1..5? Doubled JT closes over the value spine's per-group
  exclusive prefix counts (10 unrolled group pairs, ties at half
  weight); mean and the THREE-term tie-corrected variance are all
  exact integer aggregates. Strictly more powerful than
  kruskal_wallis when the alternative is ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_JT_GROUPS = 5


# ---------------------------------------------------------------------------
# Brown-Forsythe robust variance-homogeneity F.
# ---------------------------------------------------------------------------
@register(
    "brown_forsythe",
    """
    WITH vals AS (
      SELECT l_returnflag AS g,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) // 100 AS v
      FROM lineitem),
    spine AS (
      SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY g, v),
    cum AS (
      SELECT g, v,
             sum(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             sum(c) OVER (PARTITION BY g) AS ng
      FROM spine),
    med AS (
      SELECT g, min(v) AS m FROM cum WHERE 2 * cc >= ng GROUP BY g),
    z AS (
      SELECT v.g, abs(v.v - m.m) AS z
      FROM vals v JOIN med m ON v.g = m.g),
    gs AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(z) AS HUGEINT) AS s,
             CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS q
      FROM z GROUP BY g),
    tot AS (
      SELECT CAST(sum(n) AS HUGEINT) AS nn, CAST(sum(s) AS HUGEINT) AS ss,
             CAST(count(*) AS BIGINT) AS k
      FROM gs),
    terms AS (
      SELECT CAST(sum(s * s // n) AS HUGEINT) AS sq_over_n,
             CAST(sum((n * q - s * s) // n) AS HUGEINT) AS within
      FROM gs),
    f AS (
      SELECT t.k, CAST(tt.nn AS BIGINT) AS n_total,
             (CAST(t2.sq_over_n AS DOUBLE)
              - CAST(tt.ss AS DOUBLE) * tt.ss / tt.nn) AS between_ss,
             CAST(t2.within AS DOUBLE) AS within_ss
      FROM tot t CROSS JOIN tot tt CROSS JOIN terms t2)
    SELECT n_total, CAST(k AS INTEGER) AS k_groups,
           round(between_ss / (k - 1)
                 / (within_ss / (n_total - k)), 6) AS bf_stat,
           CAST(k - 1 AS INTEGER) AS dof1,
           CAST(n_total - k AS BIGINT) AS dof2
    FROM f
    """,
    tags=("stats", "variance", "exact-arith"),
)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe: one-way ANOVA F on z = |price - group median|
    across the three return-flag classes (whole dollars so every
    floor-division result stays in range at any SF). Medians come from
    the GROUPED rank plan; between-SS uses sum(S_g^2 div n_g) - S^2/N
    and within-SS sum((n Q - S^2) div n) -- exact integers except a
    <=1-per-group floor, identical both engines. The robust
    variance-equality gate one runs before trusting anova_dow's F."""
    li = read_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_returnflag").alias("g"),
        F.expr(
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) DIV 100"
        ).alias("v"),
    )
    spine = vals.groupBy("g", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    totals = spine.groupBy("g").agg(F.sum("c").cast("bigint").alias("ng"))
    cum = (
        with_global_rank(
            spine, "v", [F.col("v")], prefix_sum={"cc": "c"}, partition_cols=["g"]
        )
        .drop("global_rank")
        .join(F.broadcast(totals), "g")
    )
    med = (
        cum.where(2 * F.col("cc") >= F.col("ng"))
        .groupBy("g")
        .agg(F.min("v").alias("m"))
    )
    z = vals.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("v") - F.col("m")).alias("z")
    )
    zd = F.col("z").cast(_DEC)
    gs = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("z").cast(_DEC).alias("s"),
        F.sum(zd * zd).cast(_DEC).alias("q"),
    )
    tot = gs.agg(
        F.sum("n").cast(_DEC).alias("nn"),
        F.sum("s").cast(_DEC).alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    terms = gs.agg(
        F.sum(F.expr("CAST(s * s DIV n AS DECIMAL(38,0))")).cast(_DEC).alias(
            "sq_over_n"
        ),
        F.sum(F.expr("CAST((n * q - s * s) DIV n AS DECIMAL(38,0))"))
        .cast(_DEC)
        .alias("within"),
    )
    f = tot.crossJoin(F.broadcast(terms)).select(
        "k",
        F.col("nn").cast("bigint").alias("n_total"),
        (
            F.col("sq_over_n").cast("double")
            - F.col("ss").cast("double") * F.col("ss") / F.col("nn")
        ).alias("between_ss"),
        F.col("within").cast("double").alias("within_ss"),
    )
    return f.select(
        "n_total",
        F.col("k").cast("int").alias("k_groups"),
        F.round(
            F.col("between_ss")
            / (F.col("k") - 1)
            / (F.col("within_ss") / (F.col("n_total") - F.col("k"))),
            6,
        ).alias("bf_stat"),
        (F.col("k") - 1).cast("int").alias("dof1"),
        (F.col("n_total") - F.col("k")).cast("bigint").alias("dof2"),
    )


# ---------------------------------------------------------------------------
# Bartlett's parametric variance-homogeneity test.
# ---------------------------------------------------------------------------
@register(
    "bartlett_test",
    """
    WITH vals AS (
      SELECT l_returnflag AS g,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) // 100 AS v
      FROM lineitem),
    gs AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS HUGEINT) AS s,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
      FROM vals GROUP BY g),
    gterms AS (
      SELECT g, n,
             CAST((n * q - s * s) // n AS HUGEINT) AS css,
             CAST(floor(1e6 * (n - 1)
                        * ln((CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
                             / (CAST(n AS DOUBLE) * (n - 1))) + 0.5) AS BIGINT)
               AS lnterm_e6,
             CAST(floor(1e15 / (n - 1) + 0.5) AS BIGINT) AS inv_e15
      FROM gs),
    agg AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(css) AS HUGEINT) AS pooled_css,
             CAST(sum(lnterm_e6) AS HUGEINT) AS sum_ln_e6,
             CAST(sum(inv_e15) AS HUGEINT) AS sum_inv_e15
      FROM gterms)
    SELECT nn AS n_total, CAST(k AS INTEGER) AS k_groups,
           round((CAST(nn - k AS DOUBLE)
                  * ln(CAST(pooled_css AS DOUBLE) / (nn - k))
                  - CAST(sum_ln_e6 AS DOUBLE) / 1e6)
                 / (1.0 + (CAST(sum_inv_e15 AS DOUBLE) / 1e15
                           - 1.0 / (nn - k)) / (3.0 * (k - 1))), 4)
             AS bartlett_stat,
           CAST(k - 1 AS INTEGER) AS dof
    FROM agg
    """,
    tags=("stats", "variance", "exact-arith"),
)
def q_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test on the same three return-flag price groups:
    B = [(N-k) ln s_p^2 - sum (n_g-1) ln s_g^2] / C. Group variances
    are exact-integer ratios; each log term floors to an e6 integer
    and each 1/(n_g-1) to an e15 integer BEFORE the cross-group sums,
    so both engines add identical addends. Bartlett is the sharp
    (normal-theory) test, brown_forsythe the robust one -- a gap
    between their verdicts is itself a non-normality signal."""
    li = read_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_returnflag").alias("g"),
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT) DIV 100").alias("v"),
    )
    vd = F.col("v").cast(_DEC)
    gs = vals.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast(_DEC).alias("s"),
        F.sum(vd * vd).cast(_DEC).alias("q"),
    )
    s2 = (
        F.col("n").cast("double") * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    gterms = gs.select(
        "g",
        "n",
        F.expr("CAST((n * q - s * s) DIV n AS DECIMAL(38,0))").alias("css"),
        F.floor(F.lit(1e6) * (F.col("n") - 1) * F.log(s2) + 0.5)
        .cast("bigint")
        .alias("lnterm_e6"),
        F.floor(F.lit(1e15) / (F.col("n") - 1) + 0.5).cast("bigint").alias("inv_e15"),
    )
    agg = gterms.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("css").cast(_DEC).alias("pooled_css"),
        F.sum("lnterm_e6").cast(_DEC).alias("sum_ln_e6"),
        F.sum("inv_e15").cast(_DEC).alias("sum_inv_e15"),
    )
    b = (
        (F.col("nn") - F.col("k")).cast("double")
        * F.log(F.col("pooled_css").cast("double") / (F.col("nn") - F.col("k")))
        - F.col("sum_ln_e6").cast("double") / 1e6
    ) / (
        1.0
        + (
            F.col("sum_inv_e15").cast("double") / 1e15
            - 1.0 / (F.col("nn") - F.col("k"))
        )
        / (3.0 * (F.col("k") - 1))
    )
    return agg.select(
        F.col("nn").alias("n_total"),
        F.col("k").cast("int").alias("k_groups"),
        F.round(b, 4).alias("bartlett_stat"),
        (F.col("k") - 1).cast("int").alias("dof"),
    )


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative test.
# ---------------------------------------------------------------------------
def _jt_pair_terms_sql() -> str:
    terms = []
    for g in range(1, _JT_GROUPS + 1):
        for h in range(g + 1, _JT_GROUPS + 1):
            terms.append(
                f"2 * CAST(c{h} AS HUGEINT) * b{g} + CAST(c{h} AS HUGEINT) * c{g}"
            )
    return " + ".join(terms)


@register(
    "jonckheere_terpstra",
    f"""
    WITH vals AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders),
    spine AS (
      SELECT v,
             {", ".join(f"CAST(sum(CASE WHEN g = {i} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}" for i in range(1, _JT_GROUPS + 1))},
             CAST(count(*) AS BIGINT) AS c
      FROM vals GROUP BY v),
    pre AS (
      SELECT *,
             {", ".join(f"coalesce(sum(c{i}) OVER w, 0) AS b{i}" for i in range(1, _JT_GROUPS + 1))}
      FROM spine
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING)),
    jt AS (
      SELECT CAST(sum({_jt_pair_terms_sql()}) AS HUGEINT) AS jt2
      FROM pre),
    gsz AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY g),
    gagg AS (
      SELECT CAST(sum(n) AS HUGEINT) AS nn,
             CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sn2,
             CAST(sum(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)) AS HUGEINT)
               AS sn_a,
             CAST(sum(CAST(n AS HUGEINT) * (n - 1) * (n - 2)) AS HUGEINT)
               AS sn_b,
             CAST(sum(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT) AS sn_c
      FROM gsz),
    tagg AS (
      SELECT CAST(sum(CAST(c AS HUGEINT) * (c - 1) * (2 * c + 5)) AS HUGEINT)
               AS st_a,
             CAST(sum(CAST(c AS HUGEINT) * (c - 1) * (c - 2)) AS HUGEINT)
               AS st_b,
             CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS HUGEINT) AS st_c
      FROM spine),
    zc AS (
      SELECT j.jt2, g.nn, g.sn2,
             (CAST(g.nn AS DOUBLE) * (g.nn - 1) * (2 * g.nn + 5)
              - CAST(g.sn_a AS DOUBLE) - CAST(t.st_a AS DOUBLE)) / 72.0
             + CAST(g.sn_b AS DOUBLE) * t.st_b
               / (36.0 * g.nn * (g.nn - 1) * (g.nn - 2))
             + CAST(g.sn_c AS DOUBLE) * t.st_c / (8.0 * g.nn * (g.nn - 1))
               AS var_jt
      FROM jt j CROSS JOIN gagg g CROSS JOIN tagg t)
    SELECT CAST(nn AS BIGINT) AS n_total,
           CAST(jt2 AS BIGINT) AS jt_x2,
           round((CAST(2 * jt2 - (nn * nn - sn2) AS DOUBLE) / 4.0)
                 / sqrt(var_jt), 6) + 0.0 AS z_score
    FROM zc
    """,
    tags=("stats", "nonparametric", "exact-arith"),
)
def q_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra: do order totals trend across priorities
    1..5? Doubled JT = sum over the 10 ordered group pairs of
    2 c_h B_g + c_h c_g on the value spine (B = exclusive prefix
    count, ties at half weight) -- exact integers, no pair
    enumeration. E[JT] = (N^2 - sum n^2)/4 and the Hollander-Wolfe
    THREE-term tie-corrected variance close over exact group-size and
    tie-count sums. Detects the monotone alternative kruskal_wallis
    dilutes across unordered groups."""
    orders = read_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("g"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
    )
    spine = vals.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("g") == i, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{i}")
            for i in range(1, _JT_GROUPS + 1)
        ],
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    pre = with_global_rank(
        spine,
        "v",
        [F.col("v")],
        prefix_sum={f"cc{i}": f"c{i}" for i in range(1, _JT_GROUPS + 1)},
    )
    for i in range(1, _JT_GROUPS + 1):
        pre = pre.withColumn(f"b{i}", F.col(f"cc{i}") - F.col(f"c{i}"))
    jt_expr = None
    for g in range(1, _JT_GROUPS + 1):
        for h in range(g + 1, _JT_GROUPS + 1):
            term = 2 * F.col(f"c{h}").cast(_DEC) * F.col(f"b{g}").cast(_DEC) + F.col(
                f"c{h}"
            ).cast(_DEC) * F.col(f"c{g}").cast(_DEC)
            jt_expr = term if jt_expr is None else jt_expr + term
    jt = pre.agg(F.sum(jt_expr).cast(_DEC).alias("jt2"))
    gsz = vals.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nd = F.col("n").cast(_DEC)
    gagg = gsz.agg(
        F.sum("n").cast(_DEC).alias("nn"),
        F.sum(nd * nd).cast(_DEC).alias("sn2"),
        F.sum(nd * (nd - 1) * (2 * nd + 5)).cast(_DEC).alias("sn_a"),
        F.sum(nd * (nd - 1) * (nd - 2)).cast(_DEC).alias("sn_b"),
        F.sum(nd * (nd - 1)).cast(_DEC).alias("sn_c"),
    )
    cd = F.col("c").cast(_DEC)
    tagg = spine.agg(
        F.sum(cd * (cd - 1) * (2 * cd + 5)).cast(_DEC).alias("st_a"),
        F.sum(cd * (cd - 1) * (cd - 2)).cast(_DEC).alias("st_b"),
        F.sum(cd * (cd - 1)).cast(_DEC).alias("st_c"),
    )
    nnd = F.col("nn").cast("double")
    var_jt = (
        (
            nnd * (F.col("nn") - 1).cast("double") * (2 * F.col("nn") + 5).cast("double")
            - F.col("sn_a").cast("double")
            - F.col("st_a").cast("double")
        )
        / 72.0
        + F.col("sn_b").cast("double")
        * F.col("st_b")
        / (
            36.0
            * nnd
            * (F.col("nn") - 1).cast("double")
            * (F.col("nn") - 2).cast("double")
        )
        + F.col("sn_c").cast("double")
        * F.col("st_c")
        / (8.0 * nnd * (F.col("nn") - 1).cast("double"))
    )
    zc = (
        jt.crossJoin(F.broadcast(gagg))
        .crossJoin(F.broadcast(tagg))
        .select("jt2", "nn", "sn2", var_jt.alias("var_jt"))
    )
    return zc.select(
        F.col("nn").cast("bigint").alias("n_total"),
        F.col("jt2").cast("bigint").alias("jt_x2"),
        (
            F.round(
                (
                    (
                        2 * F.col("jt2")
                        - (F.col("nn") * F.col("nn") - F.col("sn2"))
                    ).cast("double")
                    / 4.0
                )
                / F.sqrt("var_jt"),
                6,
            )
            + 0.0
        ).alias("z_score"),
    )
