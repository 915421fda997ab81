"""Extension batch 51: mediation analysis from exact moments and
Juilland's lexical dispersion.

Scale notes (the 100 TB story per query):
- mediation_effect runs the product-of-coefficients mediation
  decomposition (does HIGH PRIORITY raise RETURNS *through* bigger
  order values?): all three regressions -- M on X, Y on (X, M), Y on
  X -- close over the SAME exact integer moment sums from one
  aggregate (centered cross-moments S_AB = n*sum(AB) - sum(A)sum(B)
  in DECIMAL/HUGEINT), so indirect = a*b_M, direct, and total obey
  the LSEM identity bit-for-bit. Causal decomposition as one scan +
  closed forms.
- lexical_dispersion computes Juilland's D for the top-10 tokens: how
  EVENLY a token spreads across sources (frequency alone can't tell a
  ubiquitous word from one doc-dumped word). Exact e9 relative
  frequencies per source, CV across sources from exact integer sums,
  D = 1 - CV/sqrt(k-1) in one closing double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DOLLARS = "(CAST(round(o_totalprice * 100, 0) AS BIGINT) DIV 100)"  # Spark
_DOLLARS_DUCK = "(CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100)"
_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Mediation: priority -> order value -> returned.
# ---------------------------------------------------------------------------
@register(
    "mediation_effect",
    f"""
    WITH base AS (
      SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS x,
             {_DOLLARS_DUCK} AS m,
             CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
      FROM orders o
      LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                 WHERE l_returnflag = 'R') r
        ON o.o_orderkey = r.l_orderkey
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(m) AS HUGEINT) AS sm,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * m) AS HUGEINT) AS sxm,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(m * y) AS HUGEINT) AS smy,
             sum(CAST(m AS HUGEINT) * m) AS smm
      FROM base
    ),
    cen AS (
      SELECT n,
             n * sxm - sx * sm AS c_xm,
             n * sxy - sx * sy AS c_xy,
             n * smy - sm * sy AS c_my,
             n * sx - sx * sx AS c_xx,
             n * smm - sm * sm AS c_mm
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           round(CAST(c_xm AS DOUBLE) / CAST(c_xx AS DOUBLE), 6) + 0.0 AS a_path,
           round((CAST(c_my AS DOUBLE) * CAST(c_xx AS DOUBLE)
                  - CAST(c_xy AS DOUBLE) * CAST(c_xm AS DOUBLE))
                 / (CAST(c_mm AS DOUBLE) * CAST(c_xx AS DOUBLE)
                    - CAST(c_xm AS DOUBLE) * CAST(c_xm AS DOUBLE)), 6) + 0.0
             AS b_path,
           round(CAST(c_xm AS DOUBLE) / CAST(c_xx AS DOUBLE)
                 * ((CAST(c_my AS DOUBLE) * CAST(c_xx AS DOUBLE)
                     - CAST(c_xy AS DOUBLE) * CAST(c_xm AS DOUBLE))
                    / (CAST(c_mm AS DOUBLE) * CAST(c_xx AS DOUBLE)
                       - CAST(c_xm AS DOUBLE) * CAST(c_xm AS DOUBLE))), 6) + 0.0
             AS indirect_effect,
           round(CAST(c_xy AS DOUBLE) / CAST(c_xx AS DOUBLE), 6) + 0.0
             AS total_effect
    FROM cen
    """,
    tags=("causal", "mediation", "regression"),
)
def q_mediation_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a = cov(X,M)/var(X); b = partial coefficient of M in Y ~ X + M
    via the 2x2 normal equations; indirect = a*b; total =
    cov(X,Y)/var(X). Every centered moment is an exact integer
    (HUGEINT/decimal), the four outputs are deterministic doubles in
    identical operation order, and direct = total - indirect by the
    LSEM identity (invariant-pinned)."""
    li_r = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = o.join(li_r, o.o_orderkey == li_r.l_orderkey, "left").select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias("x"),
        F.expr(_DOLLARS).alias("m"),
        F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
    )
    s = base.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("m").cast(_DEC).alias("sm"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("x") * F.col("m")).cast(_DEC).alias("sxm"),
        F.sum(F.col("x") * F.col("y")).cast(_DEC).alias("sxy"),
        F.sum(F.col("m") * F.col("y")).cast(_DEC).alias("smy"),
        F.sum(F.col("m").cast(_DEC) * F.col("m")).cast(_DEC).alias("smm"),
    )
    cen = s.select(
        "n",
        (F.col("n") * F.col("sxm") - F.col("sx") * F.col("sm")).alias("c_xm"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("c_xy"),
        (F.col("n") * F.col("smy") - F.col("sm") * F.col("sy")).alias("c_my"),
        (F.col("n") * F.col("sx") - F.col("sx") * F.col("sx")).alias("c_xx"),
        (F.col("n") * F.col("smm") - F.col("sm") * F.col("sm")).alias("c_mm"),
    )
    d = lambda c: F.col(c).cast("double")
    a = d("c_xm") / d("c_xx")
    b = (d("c_my") * d("c_xx") - d("c_xy") * d("c_xm")) / (
        d("c_mm") * d("c_xx") - d("c_xm") * d("c_xm")
    )
    return cen.select(
        F.col("n").cast("bigint").alias("n_orders"),
        (F.round(a, 6) + 0.0).alias("a_path"),
        (F.round(b, 6) + 0.0).alias("b_path"),
        (F.round(a * b, 6) + 0.0).alias("indirect_effect"),
        (F.round(d("c_xy") / d("c_xx"), 6) + 0.0).alias("total_effect"),
    )


# ---------------------------------------------------------------------------
# Juilland's D dispersion of the top-10 tokens across sources.
# ---------------------------------------------------------------------------
@register(
    "lexical_dispersion",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    top AS (SELECT tok FROM toks GROUP BY tok
            ORDER BY count(*) DESC, tok LIMIT 10),
    stot AS (SELECT source, CAST(count(*) AS BIGINT) AS nt FROM toks
             GROUP BY source),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM stot),
    freq AS (
      SELECT t.tok, st.source,
             CAST((1000000000 * count(*)) // max(st.nt) AS BIGINT) AS f_e9
      FROM toks t JOIN top ON t.tok = top.tok
      JOIN stot st ON st.source = t.source
      GROUP BY t.tok, st.source
    ),
    stats AS (
      SELECT f.tok,
             CAST(sum(f.f_e9) AS BIGINT) AS s1,
             sum(CAST(f.f_e9 AS HUGEINT) * f.f_e9) AS s2,
             (SELECT k FROM ns) AS k
      FROM freq f GROUP BY f.tok
    )
    SELECT tok, CAST(k AS BIGINT) AS n_sources,
           CASE WHEN s1 = 0 THEN NULL
                ELSE round(1 - sqrt(CAST(s2 AS DOUBLE) * k
                                    / (CAST(s1 AS DOUBLE) * s1) - 1)
                           / sqrt(CAST(k AS DOUBLE) - 1), 6)
           END AS juilland_d
    FROM stats ORDER BY tok
    """,
    tags=("text", "dispersion", "lexical"),
)
def q_lexical_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D = 1 - CV/sqrt(k-1) over the k sources (absent sources count
    as zero frequency: the sums over present sources already equal
    sums over all k). CV^2 = k*s2/s1^2 - 1 from exact integer sums of
    e9 relative frequencies; D near 1 = evenly dispersed, near 0 =
    dumped in one source."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(10)
        .select("tok")
    )
    stot = toks.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
    ns = stot.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    freq = (
        toks.join(F.broadcast(top), "tok")
        .join(stot, "source")
        .groupBy("tok", "source")
        .agg(F.expr("CAST((1000000000 * count(*)) DIV max(nt) AS BIGINT)").alias("f_e9"))
    )
    stats = freq.groupBy("tok").agg(
        F.sum("f_e9").cast("bigint").alias("s1"),
        F.sum(F.col("f_e9").cast(_DEC) * F.col("f_e9")).cast(_DEC).alias("s2"),
    )
    cv = F.sqrt(
        F.col("s2").cast("double") * F.col("k") / (F.col("s1").cast("double") * F.col("s1"))
        - 1
    )
    return (
        stats.crossJoin(F.broadcast(ns))
        .select(
            "tok",
            F.col("k").cast("bigint").alias("n_sources"),
            F.when(F.col("s1") == 0, F.lit(None).cast("double"))
            .otherwise(F.round(1 - cv / F.sqrt(F.col("k").cast("double") - 1), 6))
            .alias("juilland_d"),
        )
        .orderBy("tok")
    )
