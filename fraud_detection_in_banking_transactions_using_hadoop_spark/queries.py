"""Query registry: every implemented operator from SURVEY.md 2 expressed
twice -- as a PySpark DataFrame program and as ANSI SQL for the DuckDB
oracle -- over the driver's testdata tables.

Mapping of the fraud domain onto the driver tables (FIXTURES.md 7):
`orders` stands in for the card-transaction fact (card_id -> o_custkey,
amount -> o_totalprice, ts -> o_orderdate, status -> o_orderstatus with
'F' playing GENUINE), `customer` for the member dimension, `events` for
the stream replay, `documents`/`embeddings` for the LLM-pipeline surface.

Determinism discipline (SURVEY.md 5):
- every window order includes a unique tiebreaker;
- floats produced by multi-step arithmetic are round()ed identically on
  both sides (parallel summation order differs from DuckDB's serial sum
  by ~1 ulp; rounding absorbs it);
- timestamps are emitted as 'yyyy-MM-dd HH:mm:ss' strings (DuckDB
  timestamps are UTC-naive; our session timezone is pinned to UTC);
- counts/lengths are cast to the same integer width on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.config import EngineConfig
from fraud_detection_in_banking_transactions_using_hadoop_spark.functions.scalar import distance_km, speed_kms
from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.agg_ops import grouped_ucl
from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.window_ops import (
    latest_per_group,
    moving_ucl,
    top_k_per_group,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.plans.scoring import fraud_rules
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    # DuckDB oracle; None => non-SQL-expressible (rows-only check).
    # A CALLABLE means the SQL embeds data-dependent literals (e.g. the
    # IVF centroids fit on the target tables) and is generated lazily
    # per sf_dir -- resolve with resolve_sql().
    sql: Optional[str | Callable[[str], str]]
    tags: tuple[str, ...] = field(default_factory=tuple)


def resolve_sql(q: "Query", sf_dir: str) -> Optional[str]:
    """Materialize a query's oracle SQL for a concrete sf_dir."""
    return q.sql(sf_dir) if callable(q.sql) else q.sql


_REGISTRY: list[Query] = []


def register(name: str, sql: Optional[str], tags: tuple[str, ...] = ()):
    def deco(fn):
        _REGISTRY.append(Query(name, fn, sql, tags))
        return fn

    return deco


def registry() -> list[Query]:
    # Import side-effect modules that register additional queries.
    from fraud_detection_in_banking_transactions_using_hadoop_spark import (  # noqa: F401
        queries_dq,
        queries_embed,
        queries_ext,
        queries_ext2,
        queries_ext3,
        queries_ext4,
        queries_ext5,
        queries_ext6,
        queries_ext7,
        queries_ext8,
        queries_ext9,
        queries_ext10,
        queries_ext11,
        queries_ext12,
        queries_ext13,
        queries_ext14,
        queries_ext15,
        queries_ext16,
        queries_ext17,
        queries_ext18,
        queries_ext19,
        queries_ext20,
        queries_ext21,
        queries_ext22,
        queries_ext23,
        queries_ext24,
        queries_ext25,
        queries_ext26,
        queries_ext27,
        queries_ext28,
        queries_ext29,
        queries_ext30,
        queries_ext31,
        queries_ext32,
        queries_ext33,
        queries_ext34,
        queries_ext35,
        queries_ext36,
        queries_ext37,
        queries_ext38,
        queries_ext39,
        queries_ext40,
        queries_ext41,
        queries_ext42,
        queries_ext43,
        queries_ext44,
        queries_ext45,
        queries_ext46,
        queries_ext47,
        queries_ext48,
        queries_ext49,
        queries_ext50,
        queries_ext51,
        queries_ext52,
        queries_ext53,
        queries_ext54,
        queries_ext55,
        queries_ext56,
        queries_ext57,
        queries_ext58,
        queries_ext59,
        queries_ext60,
        queries_ext61,
        queries_ext62,
        queries_ext63,
        queries_ext64,
        queries_ext65,
        queries_ext66,
        queries_ext67,
        queries_ext68,
        queries_ext69,
        queries_ext70,
        queries_ext71,
        queries_ext72,
        queries_ext73,
        queries_ext74,
        queries_ext75,
        queries_ext76,
        queries_ext77,
        queries_ext78,
        queries_ext79,
        queries_ext80,
        queries_ext81,
        queries_ext82,
        queries_ext83,
        queries_ext84,
        queries_ext85,
        queries_ext86,
        queries_ext87,
        queries_ext88,
        queries_ext89,
        queries_ext90,
        queries_ext91,
        queries_ext92,
        queries_ext93,
        queries_ext94,
        queries_ext95,
        queries_ext96,
        queries_ext97,
        queries_ext98,
        queries_ext99,
        queries_ext100,
        queries_ext101,
        queries_ext102,
        queries_ext103,
        queries_ext104,
        queries_ext105,
        queries_ext106,
        queries_ext107,
        queries_ext108,
        queries_ext109,
        queries_ext110,
        queries_ext111,
        queries_ext112,
        queries_ext113,
        queries_ext114,
        queries_ext115,
        queries_ext116,
        queries_ext117,
        queries_ext118,
        queries_ext119,
        queries_ext120,
        queries_ext121,
        queries_ext122,
        queries_ext123,
        queries_ext124,
        queries_ext125,
        queries_ext126,
        queries_ext127,
        queries_ext128,
        queries_ext129,
        queries_ext130,
        queries_ext131,
        queries_ext132,
        queries_ext133,
        queries_ext134,
        queries_ext135,
        queries_ext136,
        queries_ext137,
        queries_ext138,
        queries_ext139,
        queries_ext140,
        queries_ext141,
        queries_ext142,
        queries_ext143,
        queries_ext144,
        queries_ext145,
        queries_ext146,
        queries_ext147,
        queries_ext148,
        queries_ext149,
        queries_ext150,
        queries_ext151,
        queries_ext152,
        queries_ext153,
        queries_ext154,
        queries_ext155,
        queries_ext156,
        queries_ext157,
        queries_ext158,
        queries_ext159,
        queries_ext160,
        queries_ext161,
        queries_ext162,
        queries_ext163,
        queries_ext164,
        queries_ext165,
        queries_ext166,
        queries_ext167,
        queries_ext168,
        queries_ext169,
        queries_ext170,
        queries_ext171,
        queries_ext172,
        queries_ext173,
        queries_ext174,
        queries_ext175,
        queries_ext176,
        queries_ext177,
        queries_ext178,
        queries_ext179,
        queries_ext180,
        queries_ext181,
        queries_ext182,
        queries_ext183,
        queries_ext184,
        queries_ext185,
        queries_ext186,
        queries_ext187,
        queries_ext188,
        queries_ext189,
        queries_ext190,
        queries_ext191,
        queries_ext192,
        queries_ext193,
        queries_ext194,
        queries_ext195,
        queries_ext196,
        queries_ext197,
        queries_ext198,
        queries_ext199,
        queries_ext200,
        queries_ext201,
        queries_ext202,
        queries_ext203,
        queries_ext204,
        queries_ext205,
        queries_ext206,
        queries_ext207,
        queries_ext208,
        queries_ext209,
        queries_ext210,
        queries_ext211,
        queries_ext212,
        queries_ext213,
        queries_ext214,
        queries_ext215,
        queries_ext216,
        queries_ext217,
        queries_ext218,
        queries_ext219,
        queries_ext220,
        queries_ext221,
        queries_ext222,
        queries_ext223,
        queries_ext224,
        queries_ext225,
        queries_ext226,
        queries_ext227,
        queries_ext228,
        queries_ext229,
        queries_ext230,
        queries_ext231,
        queries_ext232,
        queries_ext233,
        queries_ext234,
        queries_ext235,
        queries_ext236,
        queries_ext237,
        queries_ext238,
        queries_ext239,
        queries_ext240,
        queries_ext241,
        queries_ext242,
        queries_ext243,
        queries_ext244,
        queries_ext245,
        queries_ext246,
        queries_ext247,
        queries_ext248,
        queries_ext249,
        queries_ext250,
        queries_ext251,
        queries_ext252,
        queries_ext253,
        queries_ext254,
        queries_ext255,
        queries_ext256,
        queries_ext257,
        queries_ext258,
        queries_ext259,
        queries_ext260,
        queries_ext261,
        queries_ext262,
        queries_ext263,
        queries_ext264,
        queries_ext265,
        queries_ext266,
        queries_feat,
        queries_funcs,
        queries_funcs2,
        queries_graph,
        queries_llm,
        queries_llm2,
        queries_modern,
        queries_pipeline,
        queries_pipeline2,
        queries_tpch,
        queries_tpch2,
        queries_tpch3,
    )

    return list(_REGISTRY)


_FMT_S = "yyyy-MM-dd HH:mm:ss"  # Spark pattern
_FMT_D = "%Y-%m-%d %H:%M:%S"  # DuckDB strftime pattern


# ---------------------------------------------------------------------------
# W1/W2 + A1-A3 + P2: the authoritative grouped UCL (FDProcBatch.txt:276-310)
# ---------------------------------------------------------------------------
@register(
    "ucl_grouped",
    f"""
    WITH ranked AS (
      SELECT o_custkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders WHERE o_orderstatus = 'F')
    SELECT o_custkey AS card_id,
           count(*) AS n_txn,
           round(avg(o_totalprice), 6) AS avg_amount,
           round(avg(o_totalprice) + 3 * stddev_pop(o_totalprice), 6) AS ucl
    FROM ranked WHERE rn <= 10 GROUP BY o_custkey
    """,
    tags=("P2", "W1", "W2", "A1", "A2", "A3"),
)
def q_ucl_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    genuine = orders.filter(F.col("o_orderstatus") == "F")
    ucl = grouped_ucl(
        genuine,
        key="o_custkey",
        amount_col="o_totalprice",
        order_by=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
        last_n=10,
        sigma=3.0,
    )
    return ucl.select(
        F.col("o_custkey").alias("card_id"),
        F.col("n_txn"),
        F.round("avg_amount", 6).alias("avg_amount"),
        F.round("ucl", 6).alias("ucl"),
    )


# ---------------------------------------------------------------------------
# W4: README's moving-window UCL variant (README.md:204-213)
# ---------------------------------------------------------------------------
@register(
    "ucl_windowed",
    """
    SELECT o_orderkey,
           round(avg(o_totalprice) OVER w + 3 * stddev_pop(o_totalprice) OVER w, 4)
             AS ucl_moving
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
    tags=("W4", "A2"),
)
def q_ucl_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    df = moving_ucl(
        orders,
        partition_by="o_custkey",
        order_by=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        amount_col="o_totalprice",
        n=10,
        sigma=3.0,
        out_col="ucl_moving",
    )
    # round(4), not 6: windowed stddev over ~8e5-magnitude values carries
    # ~1e-11 cross-engine noise (segment-tree vs frame-recompute summation
    # order); at 150k rows round(6) lands on a boundary a few times.
    return df.select("o_orderkey", F.round("ucl_moving", 4).alias("ucl_moving"))


# ---------------------------------------------------------------------------
# W3: argmax per group -- latest transaction per card (FDProcBatch.txt:319-333)
# ---------------------------------------------------------------------------
_LATEST_SQL = f"""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
    SELECT o_custkey AS card_id,
           o_orderkey AS last_txn_id,
           strftime(o_orderdate, '{_FMT_D}') AS last_txn_ts
    FROM ranked WHERE rn = 1
    """


@register("latest_txn", _LATEST_SQL, tags=("W1", "W3", "P3"))
def q_latest_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    latest = latest_per_group(
        orders, ["o_custkey"], [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]
    )
    return latest.select(
        F.col("o_custkey").alias("card_id"),
        F.col("o_orderkey").alias("last_txn_id"),
        F.date_format("o_orderdate", _FMT_S).alias("last_txn_ts"),
    )


# ---------------------------------------------------------------------------
# J1: dim |x| dim |x| dim broadcast joins (FDProcBatch.txt:259-267)
# ---------------------------------------------------------------------------
@register(
    "member_score_join",
    """
    SELECT c_custkey AS member_id, c_name, c_acctbal AS score, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
    tags=("J1",),
)
def q_member_score_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("c_custkey").alias("member_id"),
            "c_name",
            F.col("c_acctbal").alias("score"),
            "n_name",
            "r_name",
        )
    )


# ---------------------------------------------------------------------------
# J2: 3-way join on card_id assembling the lookup row (FDProcBatch.txt:342-354)
# ---------------------------------------------------------------------------
@register(
    "lookup_build",
    f"""
    WITH genuine AS (
      SELECT o_custkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders WHERE o_orderstatus = 'F'),
    card_ucl AS (
      SELECT o_custkey AS card_id,
             round(avg(o_totalprice) + 3 * stddev_pop(o_totalprice), 6) AS ucl
      FROM genuine WHERE rn <= 10 GROUP BY o_custkey),
    latest AS (
      SELECT o_custkey AS card_id, o_orderkey AS last_txn_id,
             strftime(o_orderdate, '{_FMT_D}') AS last_txn_ts
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) r WHERE rn = 1),
    card_score AS (
      SELECT c_custkey AS card_id, c_acctbal AS score FROM customer)
    SELECT s.card_id, u.ucl, l.last_txn_id, l.last_txn_ts, s.score
    FROM card_score s
    JOIN card_ucl u ON s.card_id = u.card_id
    JOIN latest l ON s.card_id = l.card_id
    """,
    tags=("J2",),
)
def q_lookup_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    order_desc = [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]

    card_ucl = (
        grouped_ucl(
            orders.filter(F.col("o_orderstatus") == "F"),
            key="o_custkey",
            amount_col="o_totalprice",
            order_by=order_desc,
        )
        .select(F.col("o_custkey").alias("card_id"), F.round("ucl", 6).alias("ucl"))
    )
    latest = latest_per_group(orders, ["o_custkey"], order_desc).select(
        F.col("o_custkey").alias("card_id"),
        F.col("o_orderkey").alias("last_txn_id"),
        F.date_format("o_orderdate", _FMT_S).alias("last_txn_ts"),
    )
    card_score = customer.select(
        F.col("c_custkey").alias("card_id"), F.col("c_acctbal").alias("score")
    )
    return (
        card_score.join(card_ucl, "card_id", "inner")
        .join(latest, "card_id", "inner")
        .select("card_id", "ucl", "last_txn_id", "last_txn_ts", "score")
    )


# ---------------------------------------------------------------------------
# J3 + F4: fact |x| dim join with CASE-derived status (README.md:251-280)
# ---------------------------------------------------------------------------
@register(
    "fact_dim_case",
    """
    SELECT o_orderkey, o_custkey,
           CASE WHEN c_acctbal < 1000 THEN 'FRAUDULENT' ELSE o_orderstatus END AS status
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tags=("J3", "F4"),
)
def q_fact_dim_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(F.col("c_acctbal") < 1000, "FRAUDULENT")
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
        )
    )


# ---------------------------------------------------------------------------
# P1/P2/S4: projection + filter, pushed down to the parquet scan
# ---------------------------------------------------------------------------
@register(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_returnflag = 'R'
    """,
    tags=("P1", "P2", "S4"),
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01")) & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


# ---------------------------------------------------------------------------
# W2: top-k per group on the big fact table
# ---------------------------------------------------------------------------
@register(
    "topk_per_supplier",
    """
    WITH ranked AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             CAST(row_number() OVER (PARTITION BY l_suppkey
                                     ORDER BY l_extendedprice DESC,
                                              l_orderkey, l_linenumber) AS INTEGER) AS rn
      FROM lineitem)
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
    FROM ranked WHERE rn <= 3
    """,
    tags=("W1", "W2", "P3"),
)
def q_topk_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    top = top_k_per_group(
        li,
        ["l_suppkey"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        k=3,
    )
    return top.select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")


# ---------------------------------------------------------------------------
# Flagship: the three-rule fraud scorer replayed over the events stream table
# (P4 + F5 + F6 + F7 + W1-lag; FinFraudGuard.java:68-92 semantics)
# ---------------------------------------------------------------------------
_FRAUD_SCORE_SQL = """
    WITH e AS (
      SELECT event_id, user_id, ts, value,
             CAST(nullif(regexp_extract(props, '"k": (\\d+)', 1), '') AS INTEGER) AS k
      FROM events),
    l AS (
      SELECT e.*, lag(ts) OVER w AS prev_ts, lag(k) OVER w AS prev_k
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    g AS (
      SELECT event_id, user_id, value, k,
             (epoch_us(ts) - epoch_us(prev_ts)) / 1000000.0 AS dt,
             (k % 90) * 1.7 - 76.5 AS lat, (k % 180) * 1.9 - 171.0 AS lon,
             (prev_k % 90) * 1.7 - 76.5 AS plat, (prev_k % 180) * 1.9 - 171.0 AS plon
      FROM l),
    d AS (
      SELECT event_id, user_id, value, k, dt,
             CASE WHEN lat IS NULL OR lon IS NULL OR plat IS NULL OR plon IS NULL
                  THEN NULL
                  WHEN lat = plat AND lon = plon THEN 0.0
                  ELSE acos(least(1.0, greatest(-1.0,
                         sin(radians(lat)) * sin(radians(plat)) +
                         cos(radians(lat)) * cos(radians(plat)) *
                         cos(radians(lon) - radians(plon))
                       ))) * 6371.0 END AS dist_km
      FROM g),
    s AS (SELECT *, CASE WHEN dt > 0 THEN dist_km / dt END AS speed FROM d)
    SELECT event_id, user_id,
           round(dist_km, 6) AS dist_km,
           round(dt, 6) AS dt_seconds,
           round(speed, 6) AS speed_kms,
           CASE WHEN coalesce(k < 3, FALSE)
                  OR coalesce(value > 400, FALSE)
                  OR coalesce(dt <= 0 OR speed > 0.25, FALSE)
                THEN 'FRAUD' ELSE 'GENUINE' END AS status
    FROM s
    """


@register("fraud_score_events", _FRAUD_SCORE_SQL, tags=("P4", "F5", "F6", "F7", "J6"))
def q_fraud_score_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of the speed-layer scorer on the events table.

    `k` (parsed from the JSON props, S12-style) plays the credit score
    (threshold 3) and seeds a deterministic fake geolocation; `value`
    plays the amount with a constant UCL of 400; consecutive events of a
    user give dt/distance/speed exactly like the reference's lookup state
    (FinFraudGuard.java:73-79).
    """
    ev = read_table(spark, sf_dir, "events")
    k = F.nullif(F.regexp_extract("props", r'"k": (\d+)', 1), F.lit("")).cast("int")
    ev = ev.withColumn("k", k)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ev = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn("prev_k", F.lag("k").over(w))

    lat = (F.col("k") % 90) * 1.7 - 76.5
    lon = (F.col("k") % 180) * 1.9 - 171.0
    plat = (F.col("prev_k") % 90) * 1.7 - 76.5
    plon = (F.col("prev_k") % 180) * 1.9 - 171.0

    scored = (
        # dt from integer microseconds then one division: bit-identical to
        # the oracle, unlike cast-to-double epoch subtraction (1-ulp drift).
        ev.withColumn(
            "dt", (F.unix_micros("ts") - F.unix_micros("prev_ts")) / F.lit(1000000.0)
        )
        .withColumn("dist_km", distance_km(lat, lon, plat, plon))
        .withColumn("speed", speed_kms(F.col("dist_km"), F.col("dt")))
        .withColumn(
            "status",
            fraud_rules(
                score=F.col("k"),
                amount=F.col("value"),
                ucl=F.lit(400.0),
                speed=F.col("speed"),
                dt_seconds=F.col("dt"),
                cfg=EngineConfig(score_threshold=3),
            ),
        )
    )
    return scored.select(
        "event_id",
        "user_id",
        F.round("dist_km", 6).alias("dist_km"),
        F.round("dt", 6).alias("dt_seconds"),
        F.round("speed", 6).alias("speed_kms"),
        "status",
    )


# ---------------------------------------------------------------------------
# F1/F2/F9 + string surface: scalar function library
# ---------------------------------------------------------------------------
@register(
    "scalar_funcs",
    """
    SELECT c_custkey,
           regexp_replace(c_name, '[^0-9]', '', 'g') AS digits,
           concat_ws(',', c_name, c_mktsegment) AS csv_line,
           CAST(upper(c_mktsegment) = 'BUILDING' AS INTEGER) AS is_building,
           CAST(length(c_name) AS INTEGER) AS name_len,
           lower(c_mktsegment) AS seg_lower,
           substr(c_name, 10, 9) AS id_part
    FROM customer
    """,
    tags=("F2", "F9", "P1"),
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[^0-9]", "").alias("digits"),
        F.concat_ws(",", "c_name", "c_mktsegment").alias("csv_line"),
        (F.upper("c_mktsegment") == "BUILDING").cast("int").alias("is_building"),
        F.length("c_name").cast("int").alias("name_len"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 10, 9).alias("id_part"),
    )


# ---------------------------------------------------------------------------
# A1: TPC-H Q1-style grouped aggregation over the big fact table
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "P2"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-way join + agg (TPC-H Q5 shape): exercises join ordering/broadcast
# ---------------------------------------------------------------------------
@register(
    "revenue_by_nation",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    tags=("J1", "J2", "J3", "A1"),
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == customer.c_nationkey),
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Set operations (engine surface beyond the reference, SURVEY.md 2.7)
# ---------------------------------------------------------------------------
@register(
    "set_ops_except",
    """
    WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
    b AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000),
    c AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P')
    (SELECT k FROM a UNION SELECT k FROM b) EXCEPT (SELECT k FROM c)
    """,
    tags=("setop",),
)
def q_set_ops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = orders.filter(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("k"))
    c = orders.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("k"))
    return a.union(b).distinct().subtract(c)


@register(
    "set_ops_intersect",
    """
    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
    """,
    tags=("setop",),
)
def q_set_ops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = orders.filter(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


# ---------------------------------------------------------------------------
# Global sort + limit (TakeOrderedAndProject -- no full sort at scale)
# ---------------------------------------------------------------------------
@register(
    "global_topk",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("sort", "limit"),
)
def q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# S2/P5: incremental high-watermark predicate + grouped rollup on events
# ---------------------------------------------------------------------------
@register(
    "incremental_watermark",
    f"""
    SELECT event_type, count(*) AS n,
           round(sum(value), 4) AS total_value,
           strftime(max(ts), '{_FMT_D}') AS max_ts,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS max_epoch
    FROM events
    WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY event_type
    """,
    tags=("S2", "P5", "A1", "F1"),
)
def q_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") > F.lit("2024-01-15 00:00:00"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.date_format(F.max("ts"), _FMT_S).alias("max_ts"),
            F.unix_timestamp(F.max("ts")).alias("max_epoch"),
        )
    )
