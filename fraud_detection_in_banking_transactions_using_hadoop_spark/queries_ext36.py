"""Extension batch 36: per-node clustering coefficients, Burrows'
delta stylometry, and business-day lead times.

Scale notes (the 100 TB story per query):
- clustering_coefficient extends the oriented-two-join triangle
  machinery to PER-NODE local coefficients: each oriented triangle
  credits its three vertices (explode), degrees come from one edge
  groupBy, and lcc = 2*tri/(deg*(deg-1)) in integer ppm. Same
  wedge-bounded join as triangle_counts -- no neighborhood
  materialization per node.
- stylometry_burrows_delta is authorship/stylometry's standard
  distance: z-scores of the top-20 token frequencies across sources
  (exact e9 relative frequencies; mean/var per token from exact
  integer sums), then pairwise mean |z_a - z_b| with each token term
  rounded to an e6 integer before the cross-token sum (order-free).
  The corpus collapses to a 20 x |sources| table before any float.
- business_days_lead_time is calendar arithmetic done exactly:
  weekday count in [order, ship) via the closed form
  wb(d) = 5*(k DIV 7) + least(k MOD 7, 5) anchored on a known Monday
  (1994-12-26), so both engines agree integer-for-integer with NO
  dow-convention coupling. Per-priority lead-time summary in e3
  fixed-point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_graph import _SHINGLE_PAIRS_CTE
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# Per-node local clustering coefficient on the near-dup doc graph.
# ---------------------------------------------------------------------------
@register(
    "clustering_coefficient",
    f"""
    WITH {_SHINGLE_PAIRS_CTE},
    e AS (SELECT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
          FROM pairs WHERE doc_a <> doc_b),
    deg AS (
      SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS n FROM e UNION ALL SELECT b FROM e
      ) GROUP BY n
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    pert AS (
      SELECT n, CAST(count(*) AS BIGINT) AS t FROM (
        SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY n
    )
    SELECT d.n AS doc_id, d.d AS degree,
           coalesce(p.t, 0) AS n_triangles,
           CAST((2000000 * coalesce(p.t, 0)) // (d.d * (d.d - 1)) AS BIGINT)
             AS lcc_ppm
    FROM deg d LEFT JOIN pert p ON d.n = p.n
    WHERE d.d >= 2
    """,
    tags=("graph", "triangles", "clustering"),
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each oriented triangle (found once as x<y<z) credits all three
    vertices; lcc = 2*tri/(deg*(deg-1)) in integer ppm for nodes with
    degree >= 2. Reuses the production LSH candidate graph, so the
    expensive lineage is shared with triangle_counts; only the credit
    explode and two small groupBys are new."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8, shingle_w=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
    e = pairs.where(F.col("doc_a") != F.col("doc_b")).select(
        F.least("doc_a", "doc_b").alias("a"), F.greatest("doc_a", "doc_b").alias("b")
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    pert = (
        tri.select(F.col("x").alias("n"))
        .unionAll(tri.select(F.col("y").alias("n")))
        .unionAll(tri.select(F.col("z").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    return (
        deg.join(pert, "n", "left")
        .where(F.col("d") >= 2)
        .select(
            F.col("n").alias("doc_id"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("n_triangles"),
            F.expr(
                "CAST((2000000 * coalesce(t, 0)) DIV (d * (d - 1)) AS BIGINT)"
            ).alias("lcc_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Burrows' delta between sources over the top-20 tokens.
# ---------------------------------------------------------------------------
_TOP_TOKENS = 20


@register(
    "stylometry_burrows_delta",
    f"""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    top AS (
      SELECT tok FROM toks GROUP BY tok
      ORDER BY count(*) DESC, tok LIMIT {_TOP_TOKENS}
    ),
    stot AS (SELECT source, CAST(count(*) AS BIGINT) AS nt FROM toks
             GROUP BY source),
    freq AS (
      SELECT t.source, t.tok,
             CAST((1000000000 * count(*)) // max(st.nt) AS BIGINT) AS f_e9
      FROM toks t JOIN top ON t.tok = top.tok
      JOIN stot st ON st.source = t.source
      GROUP BY t.source, t.tok
    ),
    stats AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS ns,
             CAST(sum(f_e9) AS BIGINT) AS s1,
             sum(f_e9 * f_e9) AS s2
      FROM freq GROUP BY tok
    ),
    z AS (
      SELECT f.source, f.tok,
             (f.f_e9 - CAST(s.s1 AS DOUBLE) / s.ns)
               / sqrt(CAST(s.s2 AS DOUBLE) / s.ns
                      - (CAST(s.s1 AS DOUBLE) / s.ns)
                        * (CAST(s.s1 AS DOUBLE) / s.ns)) AS zv
      FROM freq f JOIN stats s ON f.tok = s.tok
      WHERE s.s2 * s.ns > s.s1 * s.s1
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(round(1000000.0 * abs(a.zv - b.zv), 0) AS BIGINT) AS term_e6
      FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
    )
    SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(term_e6) // count(*) AS BIGINT) AS delta_e6
    FROM pairs GROUP BY src_a, src_b
    """,
    tags=("text", "stylometry", "distance"),
)
def q_stylometry_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' delta between corpus sources: exact e9 relative
    frequencies of the top-20 tokens, per-token mean/variance across
    sources from exact integer sums, z-scores (one deterministic
    double), and pairwise mean |z_a - z_b| with per-token e6 rounding
    before the sum. Degenerate tokens (zero variance across sources)
    drop in both engines."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(_TOP_TOKENS)
        .select("tok")
    )
    stot = toks.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
    freq = (
        toks.join(F.broadcast(top), "tok")
        .join(stot, "source")
        .groupBy("source", "tok")
        .agg(
            F.expr("CAST((1000000000 * count(*)) DIV max(nt) AS BIGINT)").alias("f_e9")
        )
    )
    stats = freq.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("ns"),
        F.sum("f_e9").cast("bigint").alias("s1"),
        F.sum(F.col("f_e9") * F.col("f_e9")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("ns")
    var = F.col("s2").cast("double") / F.col("ns") - mean * mean
    z = (
        freq.join(stats, "tok")
        .where(F.col("s2") * F.col("ns") > F.col("s1") * F.col("s1"))
        .select(
            "source",
            "tok",
            ((F.col("f_e9") - mean) / F.sqrt(var)).alias("zv"),
        )
    )
    a, b = z.alias("a"), z.alias("b")
    pairs = a.join(
        b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.source") < F.col("b.source"))
    ).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.round(1000000.0 * F.abs(F.col("a.zv") - F.col("b.zv")), 0)
        .cast("bigint")
        .alias("term_e6"),
    )
    return pairs.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.expr("CAST(sum(term_e6) DIV count(*) AS BIGINT)").alias("delta_e6"),
    )


# ---------------------------------------------------------------------------
# Business-day lead times via the anchored-Monday closed form.
# ---------------------------------------------------------------------------
_MONDAY = "1994-12-26"  # Monday before the order-date range


def _wb_sql(datecol: str) -> str:
    k = f"date_diff('day', DATE '{_MONDAY}', CAST({datecol} AS DATE))"
    return f"(5 * ({k} // 7) + least({k} % 7, 5))"


@register(
    "business_days_lead_time",
    f"""
    WITH lead AS (
      SELECT o.o_orderpriority,
             {_wb_sql("l.l_shipdate")} - {_wb_sql("o.o_orderdate")} AS bd
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(min(bd) AS BIGINT) AS min_bd,
           CAST(max(bd) AS BIGINT) AS max_bd,
           CAST((1000 * sum(bd)) // count(*) AS BIGINT) AS avg_bd_e3
    FROM lead GROUP BY o_orderpriority
    """,
    tags=("datetime", "calendar", "sla"),
)
def q_business_days_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-only order->ship lead time: wb(d) = 5*(k DIV 7) +
    least(k MOD 7, 5) with k = days since the anchor Monday
    (1994-12-26, before the data range so k is never negative and
    DIV/MOD agree across engines); lead = wb(ship) - wb(order). Pure
    integer arithmetic; per-priority summary in e3 fixed-point."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")

    def wb(datecol: str):
        k = F.datediff(F.col(datecol).cast("date"), F.lit(_MONDAY).cast("date"))
        return 5 * F.expr(
            f"datediff(CAST({datecol} AS DATE), DATE'{_MONDAY}') DIV 7"
        ) + F.least(k % 7, F.lit(5))

    lead = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", (wb("l_shipdate") - wb("o_orderdate")).alias("bd")
    )
    return lead.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.min("bd").cast("bigint").alias("min_bd"),
        F.max("bd").cast("bigint").alias("max_bd"),
        F.expr("CAST((1000 * sum(bd)) DIV count(*) AS BIGINT)").alias("avg_bd_e3"),
    )
