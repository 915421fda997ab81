"""Extension batch 128 (round 6): distributional experimentation and
supply-chain risk -- quantile treatment effects (the A/B answer beyond
the mean) and per-part supplier concentration (HHI + single-sourcing).

Scale notes (the 100 TB story):
- qte_events_variant reads three exact order statistics PER
  ARM off the grouped purchase-cent spine (one grouped rank pass,
  partition_cols=['arm'] -- each arm fans out over its buckets), so
  the QTE row set is 3 exact integer differences. Means can hide a
  treatment that moves only the tails; QTE is the honest view.
- supply_concentration_parts is two grouped aggregations: per
  (part, supplier) quantities -> per-part HHI as an e9 integer
  rational (shares of exact integer quantities), plus the
  single-source flag; the fleet-level summary folds exact integers
  only. Part keys shard naturally; no joins beyond the roll-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_QS = (25, 50, 75)


@register(
    "qte_events_variant",
    f"""
    WITH vals AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS arm,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'),
    spine AS (
      SELECT arm, v, CAST(count(*) AS BIGINT) AS c
      FROM vals GROUP BY arm, v),
    pre AS (
      SELECT arm, v, c,
             sum(c) OVER (PARTITION BY arm ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    tot AS (
      SELECT arm, CAST(sum(c) AS BIGINT) AS n FROM spine GROUP BY arm),
    qs AS (SELECT unnest(ARRAY{list(_QS)}) AS q),
    cuts AS (
      SELECT t.arm, q.q,
             (SELECT min(v) FROM pre p
              WHERE p.arm = t.arm AND 100 * p.cc >= q.q * t.n) AS vq
      FROM tot t CROSS JOIN qs q)
    SELECT a.q,
           (SELECT n FROM tot WHERE arm = 1) AS n_treat,
           (SELECT n FROM tot WHERE arm = 0) AS n_control,
           round(a.vq / 100.0, 2) AS q_treat_dollars,
           round(b.vq / 100.0, 2) AS q_control_dollars,
           round((a.vq - b.vq) / 100.0, 2) AS qte_dollars
    FROM cuts a JOIN cuts b ON b.q = a.q AND b.arm = 0
    WHERE a.arm = 1
    """,
    tags=("stats", "experimentation", "quantile"),
)
def q_qte_events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects of the variant split (user_id parity)
    on purchase value: exact p25/p50/p75 per arm from the grouped cent
    spine, QTE = q_treat - q_control per quantile. A treatment that
    fattens the right tail while the mean sleeps shows up HERE -- the
    distributional complement to ab_test_proportions/stratified ATE.
    Order statistic: smallest v with 100*F(v) >= q*n (type-1,
    engine-exact integers)."""
    ev = read_table(spark, sf_dir, "events")
    vals = ev.where(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    spine = vals.groupBy("arm", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    pre = with_global_rank(
        spine, "v", [F.col("v")], prefix_sum={"cc": "c"}, partition_cols=["arm"]
    ).select("arm", "v", "cc")
    tot = spine.groupBy("arm").agg(F.sum("c").cast("bigint").alias("n"))
    qs = spark.createDataFrame([(q,) for q in _QS], "q int")
    pj = pre.join(tot, "arm").crossJoin(F.broadcast(qs))
    cuts = (
        pj.where(100 * F.col("cc") >= F.col("q") * F.col("n"))
        .groupBy("arm", "q")
        .agg(F.min("v").alias("vq"))
    )
    nt = tot.where(F.col("arm") == 1).select(F.col("n").alias("n_treat"))
    nc = tot.where(F.col("arm") == 0).select(F.col("n").alias("n_control"))
    a = cuts.where(F.col("arm") == 1).select("q", F.col("vq").alias("v1"))
    b = cuts.where(F.col("arm") == 0).select(
        F.col("q").alias("qb"), F.col("vq").alias("v0")
    )
    return (
        a.join(F.broadcast(b), a.q == b.qb)
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nc))
        .select(
            "q",
            "n_treat",
            "n_control",
            F.round(F.col("v1") / 100.0, 2).alias("q_treat_dollars"),
            F.round(F.col("v0") / 100.0, 2).alias("q_control_dollars"),
            F.round((F.col("v1") - F.col("v0")) / 100.0, 2).alias("qte_dollars"),
        )
    )


@register(
    "supply_concentration_parts",
    """
    WITH ps AS (
      SELECT l_partkey AS part, l_suppkey AS supp,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    scored AS (
      SELECT part,
             CAST(round(1000000000.0
                        * (qty / sum(qty) OVER (PARTITION BY part))
                        * (qty / sum(qty) OVER (PARTITION BY part)), 0)
                  AS BIGINT) AS h_e9
      FROM ps),
    per_part AS (
      SELECT part,
             CAST(count(*) AS BIGINT) AS n_supp,
             CAST(sum(h_e9) AS BIGINT) AS hhi_e9
      FROM scored GROUP BY part),
    summary AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_single_source,
             CAST(sum(hhi_e9) // count(*) AS BIGINT) AS mean_hhi_e9
      FROM per_part)
    SELECT n_parts, n_single_source,
           CAST((1000000 * n_single_source) // n_parts AS BIGINT)
             AS single_source_ppm,
           round(mean_hhi_e9 / 1000000000.0, 6) AS mean_hhi
    FROM summary
    """,
    tags=("ops", "supply-chain", "concentration"),
)
def q_supply_concentration_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration risk: per part, the HHI of supplier
    quantity shares (1.0 = single-sourced) as an e9 integer rational,
    rolled up to the fleet summary -- part count, single-source count
    and ppm, mean HHI. The procurement dashboard's 'how fragile is our
    supplier base' number, two grouped aggregations end to end."""
    li = read_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"))
    from pyspark.sql import Window

    w = Window.partitionBy("part")
    share = F.col("qty") / F.sum("qty").over(w)
    scored = ps.select(
        "part",
        "qty",
        F.round(F.lit(1000000000.0) * share * share, 0)
        .cast("bigint")
        .alias("h_e9"),
    )
    per_part = scored.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_supp"),
        F.sum("h_e9").cast("bigint").alias("hhi_e9"),
    )
    summary = per_part.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.when(F.col("n_supp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_single_source"),
        F.expr("CAST(sum(hhi_e9) DIV count(*) AS BIGINT)").alias("mean_hhi_e9"),
    )
    return summary.select(
        "n_parts",
        "n_single_source",
        F.expr(
            "CAST((1000000 * n_single_source) DIV n_parts AS BIGINT)"
        ).alias("single_source_ppm"),
        F.round(F.col("mean_hhi_e9") / 1000000000.0, 6).alias("mean_hhi"),
    )
