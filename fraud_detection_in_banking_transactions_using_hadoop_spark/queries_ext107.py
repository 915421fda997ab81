"""Extension batch 107: graph modularity, the law of one price, and
year-over-year price persistence.

- copurchase_modularity: Newman modularity Q of the BRAND partition
  over the co-purchase graph -- within-brand edge share minus the
  degree-share-squared null, every count an exact integer and each
  brand's null term an e9-floored integer. Q > 0 means baskets are
  brand-assortative, the quantitative version of what
  clustering_coefficient and label_propagation only hint at.
- law_of_one_price: per-part unit-price coefficient of variation --
  if one part trades at many prices, the 'law' fails; the e4-scaled
  CV spine gives an exact median CV and the share of high-dispersion
  parts.
- price_persistence_yoy: do expensive parts STAY expensive? Pearson
  correlation of matched per-part unit values 1996 vs 1997 from
  exact integer moments -- the persistence number repricing
  strategies assume without checking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Newman modularity of the brand partition over co-purchase edges.
# ---------------------------------------------------------------------------
@register(
    "copurchase_modularity",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
    lab AS (
      SELECT e.x, e.y, px.p_brand AS bx, py.p_brand AS by_
      FROM e
      JOIN part px ON px.p_partkey = e.x
      JOIN part py ON py.p_partkey = e.y),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
    within AS (
      SELECT bx AS brand, CAST(count(*) AS BIGINT) AS mc
      FROM lab WHERE bx = by_ GROUP BY bx),
    deg AS (
      SELECT brand, CAST(sum(d) AS BIGINT) AS dc FROM (
        SELECT bx AS brand, CAST(count(*) AS BIGINT) AS d FROM lab GROUP BY bx
        UNION ALL
        SELECT by_ AS brand, CAST(count(*) AS BIGINT) AS d FROM lab
        GROUP BY by_) u
      GROUP BY brand),
    terms AS (
      SELECT d.brand,
             CAST(floor(1e9 * (CAST(coalesce(w.mc, 0) AS DOUBLE) / mm.m
                    - (CAST(d.dc AS DOUBLE) / (2.0 * mm.m))
                      * (CAST(d.dc AS DOUBLE) / (2.0 * mm.m))) + 0.5)
                  AS BIGINT) AS q_e9
      FROM deg d
      LEFT JOIN within w ON w.brand = d.brand
      CROSS JOIN m mm),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_brands,
             CAST(sum(q_e9) AS HUGEINT) AS q
      FROM terms)
    SELECT (SELECT m FROM m) AS n_edges,
           CAST(a.n_brands AS INTEGER) AS n_brands,
           round(CAST(a.q AS DOUBLE) / 1e9, 6) + 0.0 AS modularity_q
    FROM agg a
    """,
    tags=("graph", "modularity", "exact-arith"),
)
def q_copurchase_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the brand partition over the distinct
    co-purchase edge set: Q = sum_c (m_c/m - (d_c/2m)^2) with exact
    integer edge and degree counts and e9-floored per-brand terms.
    Q near 0 says brands do NOT structure baskets (the honest null
    many merchandising decks skip); the co-purchase-graph
    counterpart of theil_decomposition's between-share."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .distinct()
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    px = part.select(F.col("p_partkey").alias("x"), F.col("p_brand").alias("bx"))
    py = part.select(F.col("p_partkey").alias("y"), F.col("p_brand").alias("by_"))
    lab = e.join(F.broadcast(px), "x").join(F.broadcast(py), "y")
    # r13: `lab` (the data-sized co-purchase self-join) used to feed
    # FOUR separate aggregates, each re-running its lineage (the
    # CLAUDE.md multi-reference rule). One grouped pass collapses it
    # to a <=|brands|^2-row contingency frame; m/within/deg are exact
    # integer rollups of that tiny checkpointed frame.
    bb = (
        lab.groupBy("bx", "by_")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    m = bb.agg(F.sum("cnt").cast("bigint").alias("m"))
    within = (
        bb.where(F.col("bx") == F.col("by_"))
        .groupBy(F.col("bx").alias("brand"))
        .agg(F.sum("cnt").cast("bigint").alias("mc"))
    )
    deg = (
        bb.groupBy(F.col("bx").alias("brand"))
        .agg(F.sum("cnt").cast("bigint").alias("d"))
        .unionByName(
            bb.groupBy(F.col("by_").alias("brand")).agg(
                F.sum("cnt").cast("bigint").alias("d")
            )
        )
        .groupBy("brand")
        .agg(F.sum("d").cast("bigint").alias("dc"))
    )
    md = F.col("m").cast("double")
    frac = F.col("dc").cast("double") / (2.0 * F.col("m"))
    terms = (
        deg.join(within, "brand", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.floor(
                F.lit(1e9)
                * (
                    F.coalesce(F.col("mc"), F.lit(0)).cast("double") / F.col("m")
                    - frac * frac
                )
                + 0.5
            )
            .cast("bigint")
            .alias("q_e9")
        )
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
        F.sum("q_e9").cast(_DEC).alias("q"),
    )
    _ = md
    return agg.crossJoin(F.broadcast(m)).select(
        F.col("m").alias("n_edges"),
        F.col("n_brands").cast("int").alias("n_brands"),
        (F.round(F.col("q").cast("double") / 1e9, 6) + 0.0).alias("modularity_q"),
    )


# ---------------------------------------------------------------------------
# Law-of-one-price dispersion audit.
# ---------------------------------------------------------------------------
@register(
    "law_of_one_price",
    """
    WITH lines AS (
      SELECT l_partkey AS pk,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS ext,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem),
    per AS (
      SELECT pk, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ext // q) AS HUGEINT) AS s,
             CAST(sum(CAST(ext // q AS HUGEINT) * (ext // q)) AS HUGEINT) AS ss
      FROM lines GROUP BY pk HAVING count(*) >= 3),
    cv AS (
      SELECT pk,
             CAST(floor(1e4 * sqrt((CAST(n AS DOUBLE) * ss
                                    - CAST(s AS DOUBLE) * s)
                                   / (CAST(n AS DOUBLE) * n))
                        / (CAST(s AS DOUBLE) / n) + 0.5) AS BIGINT) AS cv_e4
      FROM per),
    spine AS (
      SELECT cv_e4, CAST(count(*) AS BIGINT) AS c FROM cv GROUP BY cv_e4),
    ranked AS (
      SELECT cv_e4, sum(c) OVER (ORDER BY cv_e4
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM spine),
    med AS (
      SELECT min(cv_e4) AS m FROM ranked, tot WHERE 2 * cc >= n)
    SELECT (SELECT n FROM tot) AS n_parts,
           round((SELECT m FROM med) / 1e4, 4) AS median_cv,
           round(CAST(coalesce((SELECT CAST(sum(c) AS BIGINT) FROM spine
                                WHERE cv_e4 > 500), 0) AS DOUBLE)
                 / (SELECT n FROM tot), 6) AS share_cv_over_5pct
    """,
    tags=("econ", "price-dispersion", "exact-arith"),
)
def q_law_of_one_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does one part trade at one price? Per-part unit-value CV
    (integer cents-per-unit via exact floor division; parts with >=3
    lines), each CV e4-floored onto a spine for the exact median and
    the share of parts with CV > 5%. Persistent dispersion is either
    discrimination or data error -- both worth knowing; the law of
    one price predicts ~0."""
    li = read_table(spark, sf_dir, "lineitem")
    lines = li.select(
        F.col("l_partkey").alias("pk"),
        F.expr(
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
            " DIV CAST(l_quantity AS BIGINT)"
        ).alias("u"),
    )
    per = (
        lines.groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("u").cast(_DEC).alias("s"),
            F.sum(F.col("u").cast(_DEC) * F.col("u").cast(_DEC))
            .cast(_DEC)
            .alias("ss"),
        )
        .where(F.col("n") >= 3)
    )
    nd = F.col("n").cast("double")
    cv = per.select(
        F.floor(
            F.lit(1e4)
            * F.sqrt(
                (nd * F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s"))
                / (nd * F.col("n"))
            )
            / (F.col("s").cast("double") / F.col("n"))
            + 0.5
        )
        .cast("bigint")
        .alias("cv_e4")
    )
    spine = cv.groupBy("cv_e4").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = spine.agg(F.sum("c").cast("bigint").alias("n"))
    med = (
        with_global_rank(spine, "cv_e4", [F.col("cv_e4")], prefix_sum={"cc": "c"})
        .crossJoin(F.broadcast(tot))
        .where(2 * F.col("cc") >= F.col("n"))
        .agg(F.min("cv_e4").alias("m"))
    )
    hi = spine.where(F.col("cv_e4") > 500).agg(
        F.sum("c").cast("bigint").alias("nhi")
    )
    return (
        tot.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(hi))
        .select(
            F.col("n").alias("n_parts"),
            F.round(F.col("m") / 1e4, 4).alias("median_cv"),
            F.round(
                F.coalesce(F.col("nhi"), F.lit(0)).cast("double") / F.col("n"), 6
            ).alias("share_cv_over_5pct"),
        )
    )


# ---------------------------------------------------------------------------
# Year-over-year price persistence.
# ---------------------------------------------------------------------------
@register(
    "price_persistence_yoy",
    """
    WITH py AS (
      SELECT l.l_partkey AS pk, date_part('year', o.o_orderdate) AS yr,
             CAST(sum(round(l.l_extendedprice * 100, 0)) AS BIGINT) AS rev,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE date_part('year', o.o_orderdate) IN (1996, 1997)
      GROUP BY l.l_partkey, date_part('year', o.o_orderdate)),
    matched AS (
      SELECT a.pk,
             CAST(a.rev // a.qty AS BIGINT) AS u0,
             CAST(b.rev // b.qty AS BIGINT) AS u1
      FROM py a JOIN py b ON a.pk = b.pk AND a.yr = 1996 AND b.yr = 1997),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(u0) AS HUGEINT) AS s0,
             CAST(sum(u1) AS HUGEINT) AS s1,
             CAST(sum(CAST(u0 AS HUGEINT) * u0) AS HUGEINT) AS s00,
             CAST(sum(CAST(u0 AS HUGEINT) * u1) AS HUGEINT) AS s01,
             CAST(sum(CAST(u1 AS HUGEINT) * u1) AS HUGEINT) AS s11
      FROM matched)
    SELECT n AS n_matched_parts,
           round(CAST(n * s01 - s0 * s1 AS DOUBLE)
                 / sqrt(CAST(n * s00 - s0 * s0 AS DOUBLE)
                        * CAST(n * s11 - s1 * s1 AS DOUBLE)), 6) + 0.0
             AS price_persistence_r,
           round(CAST(s1 AS DOUBLE) / n / CAST(s0 AS DOUBLE) * n, 6)
             AS mean_price_ratio
    FROM mom
    """,
    tags=("econ", "persistence", "exact-arith"),
)
def q_price_persistence_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of matched per-part unit values (integer
    cents per unit, exact floor division) between 1996 and 1997, from
    exact integer moments: high r means the price structure is
    sticky and last year's price book predicts this year's; the mean
    ratio is the aggregate drift. The persistence check behind
    'we can reuse last year's elasticities'."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    py = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(F.col("l_partkey").alias("pk"), F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0))
            .cast("bigint")
            .alias("rev"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
        )
    )
    a = py.where(F.col("yr") == 1996).select(
        "pk", F.expr("CAST(rev DIV qty AS BIGINT)").alias("u0")
    )
    b = py.where(F.col("yr") == 1997).select(
        F.col("pk").alias("pk2"), F.expr("CAST(rev DIV qty AS BIGINT)").alias("u1")
    )
    matched = a.join(b, a.pk == b.pk2).select("u0", "u1")
    dd = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    mom = matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("u0").cast(_DEC).alias("s0"),
        F.sum("u1").cast(_DEC).alias("s1"),
        F.sum(dd("u0") * dd("u0")).cast(_DEC).alias("s00"),
        F.sum(dd("u0") * dd("u1")).cast(_DEC).alias("s01"),
        F.sum(dd("u1") * dd("u1")).cast(_DEC).alias("s11"),
    )
    nd = F.col("n").cast(_DEC)
    r = (nd * F.col("s01") - F.col("s0") * F.col("s1")).cast("double") / F.sqrt(
        (nd * F.col("s00") - F.col("s0") * F.col("s0")).cast("double")
        * (nd * F.col("s11") - F.col("s1") * F.col("s1")).cast("double")
    )
    return mom.select(
        F.col("n").alias("n_matched_parts"),
        (F.round(r, 6) + 0.0).alias("price_persistence_r"),
        F.round(
            F.col("s1").cast("double")
            / F.col("n")
            / F.col("s0").cast("double")
            * F.col("n"),
            6,
        ).alias("mean_price_ratio"),
    )
