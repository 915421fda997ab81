"""Extension batch 60: hapax legomena profile and brand price
premium.

Scale notes (the 100 TB story per query):
- hapax_ratio reads corpus maturity off the frequency spectrum: the
  share of vocabulary seen exactly once (hapax legomena) per source.
  High hapax share = vocabulary still growing (pairs with the Heaps
  beta); collapsing share = the source is mined out. Two map-side
  groupBys, integer ppm.
- brand_price_premium is the hedonic pricing cut: per brand, how far
  realized unit prices sit above or below the type-size peer average
  -- the premium from exact cent sums with the peer baseline as a
  (type, size)-keyed broadcast join, e3 fixed-point everywhere. The
  assortment dashboard's "is this brand earning its label" number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# Hapax legomena share per source.
# ---------------------------------------------------------------------------
@register(
    "hapax_ratio",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    types AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS m
      FROM toks GROUP BY source, tok
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dis_legomena,
           CAST((1000000 * sum(CASE WHEN m = 1 THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS hapax_ppm
    FROM types GROUP BY source
    """,
    tags=("text", "lexical", "hapax"),
)
def q_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Once-seen (hapax) and twice-seen (dis legomena) vocabulary
    shares per source from the frequency spectrum -- the corpus
    maturity gauge (Good-Turing's n1 is also the unseen-mass
    estimate). Two groupBys, integer ppm."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    types = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    return types.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("m") == 1, 1).otherwise(0)).cast("bigint").alias("n_hapax"),
        F.sum(F.when(F.col("m") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dis_legomena"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN m = 1 THEN 1 ELSE 0 END))"
            " DIV count(*) AS BIGINT)"
        ).alias("hapax_ppm"),
    )


# ---------------------------------------------------------------------------
# Brand price premium vs the (type, size) peer average.
# ---------------------------------------------------------------------------
@register(
    "brand_price_premium",
    """
    WITH sold AS (
      SELECT p.p_brand AS brand, p.p_type AS ptype, p.p_size AS psize,
             CAST(round(100 * l.l_extendedprice / l.l_quantity, 0) AS BIGINT)
               AS unit_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity > 0
    ),
    peer AS (
      SELECT ptype, psize, CAST(count(*) AS BIGINT) AS pn,
             CAST(sum(unit_cents) AS BIGINT) AS ps
      FROM sold GROUP BY ptype, psize
    ),
    per AS (
      SELECT s.brand, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(s.unit_cents) AS BIGINT) AS s_cents,
             -- peer mean excluding nothing (the brand is part of its
             -- peer group; the premium is vs the MARKET average)
             CAST(sum((1000 * p.ps) // p.pn) AS BIGINT) AS peer_e3_sum
      FROM sold s JOIN peer p ON s.ptype = p.ptype AND s.psize = p.psize
      GROUP BY s.brand
    )
    SELECT brand, n_lines,
           CAST((1000 * s_cents) // n_lines AS BIGINT) AS brand_unit_e3,
           CAST(peer_e3_sum // n_lines AS BIGINT) AS peer_unit_e3,
           CAST((1000 * s_cents) // n_lines - peer_e3_sum // n_lines
                AS BIGINT) AS premium_e3
    FROM per
    """,
    tags=("econ", "pricing", "hedonic"),
)
def q_brand_price_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per brand: realized mean unit price vs the mean of its lines'
    (type, size) peer averages -- every quantity an exact integer
    (cents, e3 fixed-point, floor division on both sides), the peer
    table a (type, size)-keyed join. Positive premium_e3 = the brand
    sells above its hedonic peers."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    sold = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
        F.col("p_size").alias("psize"),
        F.expr("CAST(round(100 * l_extendedprice / l_quantity, 0) AS BIGINT)").alias(
            "unit_cents"
        ),
    )
    peer = sold.groupBy("ptype", "psize").agg(
        F.count(F.lit(1)).cast("bigint").alias("pn"),
        F.sum("unit_cents").cast("bigint").alias("ps"),
    )
    per = (
        sold.join(peer, ["ptype", "psize"])
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("unit_cents").cast("bigint").alias("s_cents"),
            F.sum(F.expr("(1000 * ps) DIV pn")).cast("bigint").alias("peer_e3_sum"),
        )
    )
    return per.select(
        "brand",
        "n_lines",
        F.expr("CAST((1000 * s_cents) DIV n_lines AS BIGINT)").alias("brand_unit_e3"),
        F.expr("CAST(peer_e3_sum DIV n_lines AS BIGINT)").alias("peer_unit_e3"),
        F.expr(
            "CAST((1000 * s_cents) DIV n_lines - peer_e3_sum DIV n_lines AS BIGINT)"
        ).alias("premium_e3"),
    )
