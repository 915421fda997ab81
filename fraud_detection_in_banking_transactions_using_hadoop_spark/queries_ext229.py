"""Extension batch 229 (round 10): portfolio closed forms and
consistent-hash placement.

- markowitz_two_asset: the minimum-variance two-asset blend in EXACT
  RATIONALS -- assets are the two top-revenue nations' daily revenue
  streams (zero-filled on the shared date spine); with integer
  covariance numerators Caa = n*Saa - Sa^2 etc., the optimal weight is
  the closed form w* = (Cbb - Cab) / (Caa + Cbb - 2*Cab), emitted in
  exact ppm (DIV truncates toward zero identically in both engines,
  the r7 note -- shorting weights can be negative). The blended
  variance at the quantized w* closes in DECIMAL38/HUGEINT and the
  diversification ratio vs the safer single asset is one integer
  division. The hedging read: how much of stream A to pair with stream
  B to minimize combined volatility.
- consistent_hash_ring: the OTHER classic placement scheme next to
  ext207's rendezvous/HRW -- 16 shards x 8 virtual nodes at md5 ring
  positions (first 15 hex chars as a 60-bit int -- 16 could overflow
  signed BIGINT -- both engines'
  identical md5), each customer key owned by the first vnode clockwise
  (wraparound to the ring minimum). Emits per-shard population and
  share, plus the MEASURED reshard movement when shard 17 joins: only
  keys inside the new shard's 8 arcs move (expected ~8/136 of the
  ring), the guarantee modulo-hashing lacks. The 128-row ring
  broadcast makes the ownership lookup a bounded nested-loop argmin --
  allowlisted, never data x data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_RING_SHARDS = 16
_RING_VNODES = 8


# ---------------------------------------------------------------------------
# markowitz_two_asset
# ---------------------------------------------------------------------------
_MKW_SQL = """
    nrev AS (
      SELECT c.c_nationkey AS nation,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1),
    top2 AS (
      SELECT nation, row_number() OVER (ORDER BY cents DESC, nation) AS rk
      FROM nrev QUALIFY rk <= 2),
    days AS (SELECT DISTINCT o_orderdate AS d FROM orders),
    dn AS (
      SELECT o.o_orderdate AS d, c.c_nationkey AS nation,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    ab AS (
      SELECT dy.d,
             coalesce(max(CASE WHEN t.rk = 1 THEN dn.y END), 0) AS ya,
             coalesce(max(CASE WHEN t.rk = 2 THEN dn.y END), 0) AS yb
      FROM days dy
      LEFT JOIN dn ON dn.d = dy.d
      LEFT JOIN top2 t ON t.nation = dn.nation
      GROUP BY dy.d),
    nn AS (
      SELECT max(CASE WHEN rk = 1 THEN nation END) AS na,
             max(CASE WHEN rk = 2 THEN nation END) AS nb
      FROM top2),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(ya AS HUGEINT)) AS HUGEINT) AS sa,
             CAST(sum(CAST(yb AS HUGEINT)) AS HUGEINT) AS sb,
             CAST(sum(CAST(ya AS HUGEINT) * ya) AS HUGEINT) AS saa,
             CAST(sum(CAST(yb AS HUGEINT) * yb) AS HUGEINT) AS sbb,
             CAST(sum(CAST(ya AS HUGEINT) * yb) AS HUGEINT) AS sab
      FROM ab),
    cov AS (
      SELECT n,
             n * saa - sa * sa AS caa,
             n * sbb - sb * sb AS cbb,
             n * sab - sa * sb AS cab
      FROM mom),
    w AS (
      SELECT n, caa, cbb, cab,
             CASE WHEN caa + cbb - 2 * cab = 0 THEN 500000
                  ELSE CAST(((cbb - cab) * 1000000)
                       // (caa + cbb - 2 * cab) AS BIGINT)
             END AS w_ppm
      FROM cov CROSS JOIN nn)
    SELECT CAST(nn.na AS INTEGER) AS nation_a,
           CAST(nn.nb AS INTEGER) AS nation_b,
           CAST(n AS BIGINT) AS n_days,
           w_ppm AS w_a_ppm,
           CAST(caa AS DOUBLE) AS caa_n2var,
           CAST(cbb AS DOUBLE) AS cbb_n2var,
           CAST(cab AS DOUBLE) AS cab_n2cov,
           CAST((w_ppm * w_ppm * caa
                 + (1000000 - w_ppm) * (1000000 - w_ppm) * cbb
                 + 2 * w_ppm * (1000000 - w_ppm) * cab)
                // 1000000000000 AS BIGINT) AS varp_n2,
           CAST((w_ppm * w_ppm * caa
                 + (1000000 - w_ppm) * (1000000 - w_ppm) * cbb
                 + 2 * w_ppm * (1000000 - w_ppm) * cab)
                // least(caa, cbb) // 1000000 AS BIGINT)
             AS var_vs_best_single_ppm
    FROM w CROSS JOIN nn
"""


@register(
    "markowitz_two_asset",
    f"WITH {_MKW_SQL}",
    tags=("finance", "portfolio", "exact-arith"),
)
def q_markowitz_two_asset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-asset minimum-variance closed form (module docstring):
    exact integer covariance numerators, ppm weight by one truncating
    division, blended variance and the diversification ratio in wide
    integers."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    dec = "decimal(38,0)"
    nrev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    from pyspark.sql import Window

    top2 = (
        nrev.select(
            "nation",
            F.row_number()
            .over(Window.orderBy(F.col("cents").desc(), "nation"))
            .alias("rk"),
        )
        .where(F.col("rk") <= 2)
        .localCheckpoint(eager=True)
    )
    days = orders.select(F.col("o_orderdate").alias("d")).distinct()
    dn = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("o_orderdate").alias("d"), F.col("c_nationkey").alias("nation"))
        .agg(
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
                " AS BIGINT) DIV 100"
            ).alias("y")
        )
    )
    ab = (
        days.join(dn, "d", "left")
        .join(F.broadcast(top2), "nation", "left")
        .groupBy("d")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("rk") == 1, F.col("y"))), F.lit(0)
            ).alias("ya"),
            F.coalesce(
                F.max(F.when(F.col("rk") == 2, F.col("y"))), F.lit(0)
            ).alias("yb"),
        )
    )
    nat = {r["rk"]: r["nation"] for r in top2.collect()}
    mom = ab.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("ya").cast(dec)).alias("sa"),
        F.sum(F.col("yb").cast(dec)).alias("sb"),
        F.sum(F.col("ya").cast(dec) * F.col("ya")).alias("saa"),
        F.sum(F.col("yb").cast(dec) * F.col("yb")).alias("sbb"),
        F.sum(F.col("ya").cast(dec) * F.col("yb")).alias("sab"),
    )
    cov = mom.selectExpr(
        "n",
        "n * saa - sa * sa AS caa",
        "n * sbb - sb * sb AS cbb",
        "n * sab - sa * sb AS cab",
    )
    w = cov.selectExpr(
        "n",
        "caa",
        "cbb",
        "cab",
        "CASE WHEN caa + cbb - 2 * cab = 0 THEN 500000L"
        " ELSE CAST(((cbb - cab) * 1000000)"
        " DIV (caa + cbb - 2 * cab) AS BIGINT) END AS w_ppm",
    )
    return w.selectExpr(
        f"CAST({nat[1]} AS INT) AS nation_a",
        f"CAST({nat[2]} AS INT) AS nation_b",
        "CAST(n AS BIGINT) AS n_days",
        "w_ppm AS w_a_ppm",
        "CAST(caa AS DOUBLE) AS caa_n2var",
        "CAST(cbb AS DOUBLE) AS cbb_n2var",
        "CAST(cab AS DOUBLE) AS cab_n2cov",
        "CAST((w_ppm * w_ppm * caa"
        " + (1000000 - w_ppm) * (1000000 - w_ppm) * cbb"
        " + 2 * w_ppm * (1000000 - w_ppm) * cab)"
        " DIV 1000000000000 AS BIGINT) AS varp_n2",
        "CAST((w_ppm * w_ppm * caa"
        " + (1000000 - w_ppm) * (1000000 - w_ppm) * cbb"
        " + 2 * w_ppm * (1000000 - w_ppm) * cab)"
        " DIV least(caa, cbb) DIV 1000000 AS BIGINT)"
        " AS var_vs_best_single_ppm",
    )


# ---------------------------------------------------------------------------
# consistent_hash_ring
# ---------------------------------------------------------------------------
def _ring_sql(n_shards: int, sfx: str) -> str:
    return f"""
    ring{sfx} AS (
      SELECT s.s AS shard, v.v AS vnode,
             ('0x' || substr(md5('shard-' || CAST(s.s AS VARCHAR)
               || '-v-' || CAST(v.v AS VARCHAR)), 1, 15))::BIGINT AS pos
      FROM (SELECT unnest(range(0, {n_shards})) AS s) s,
           (SELECT unnest(range(0, {_RING_VNODES})) AS v) v),
    owner{sfx} AS (
      SELECT k.k,
             coalesce(
               min(CASE WHEN r.pos >= k.pos THEN r.pos END),
               (SELECT min(pos) FROM ring{sfx})) AS opos
      FROM keys_t k CROSS JOIN ring{sfx} r
      GROUP BY k.k, k.pos),
    asg{sfx} AS (
      SELECT o.k, min(r.shard) AS shard
      FROM owner{sfx} o JOIN ring{sfx} r ON r.pos = o.opos
      GROUP BY o.k)
"""


@register(
    "consistent_hash_ring",
    f"""
    WITH keys_t AS (
      SELECT c_custkey AS k,
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
               AS pos
      FROM customer),
    {_ring_sql(_RING_SHARDS, '')},
    base AS (SELECT k, shard FROM asg),
    {_ring_sql(_RING_SHARDS + 1, '2')},
    moved AS (
      SELECT CAST(sum(CASE WHEN b.shard <> a2.shard THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_moved,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM base b JOIN asg2 a2 ON a2.k = b.k),
    dist AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY shard),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
                   CAST(max(n) AS BIGINT) AS mx FROM dist)
    SELECT CAST(d.shard AS INTEGER) AS shard, d.n AS n_keys,
           (d.n * 1000000) // t.t AS share_ppm,
           (t.mx * {_RING_SHARDS} * 1000000) // t.t AS max_over_mean_ppm,
           (m.n_moved * 1000000) // m.n_keys AS moved_ppm,
           CAST({10**6 * _RING_VNODES // (_RING_VNODES * (_RING_SHARDS + 1))}
                AS BIGINT) AS expected_moved_ppm
    FROM dist d CROSS JOIN tot t CROSS JOIN moved m
    """,
    tags=("layout", "sharding", "hashing", "exact-arith"),
)
def q_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring placement (module docstring): per-shard
    population under 16 shards x 8 vnodes, plus the measured moved
    share when shard 17 joins vs the 1/17 expectation."""
    cust = read_table(spark, sf_dir, "customer")
    keys = cust.select(
        F.col("c_custkey").alias("k"),
        F.expr(
            "CAST(conv(substr(md5(CAST(c_custkey AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT)"
        ).alias("pos"),
    )

    def ring_df(n_shards: int):
        rows = [
            (s, v)
            for s in range(n_shards)
            for v in range(_RING_VNODES)
        ]
        return spark.createDataFrame(rows, "shard int, vnode int").select(
            "shard",
            "vnode",
            F.expr(
                "CAST(conv(substr(md5(concat('shard-', CAST(shard AS"
                " STRING), '-v-', CAST(vnode AS STRING))), 1, 15),"
                " 16, 10) AS BIGINT)"
            ).alias("pos"),
        ).localCheckpoint(eager=True)

    def assign(ring):
        rmin = ring.agg(F.min("pos").alias("rmin"))
        owner = (
            keys.crossJoin(F.broadcast(ring.select(F.col("pos").alias("rpos"))))
            .groupBy("k", "pos")
            .agg(
                F.min(
                    F.when(F.col("rpos") >= F.col("pos"), F.col("rpos"))
                ).alias("opos")
            )
            .crossJoin(F.broadcast(rmin))
            .select(
                "k", F.coalesce("opos", "rmin").alias("opos")
            )
        )
        return (
            owner.join(
                F.broadcast(ring.select("shard", F.col("pos").alias("opos"))),
                "opos",
            )
            .groupBy("k")
            .agg(F.min("shard").alias("shard"))
        )

    base = assign(ring_df(_RING_SHARDS))
    asg2 = assign(ring_df(_RING_SHARDS + 1))
    moved = base.join(
        asg2.withColumnRenamed("shard", "shard2"), "k"
    ).agg(
        F.sum(F.when(F.col("shard") != F.col("shard2"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_moved"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    dist = base.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = dist.agg(
        F.sum("n").cast("bigint").alias("t"),
        F.max("n").cast("bigint").alias("mx"),
    )
    exp_ppm = 10**6 * _RING_VNODES // (_RING_VNODES * (_RING_SHARDS + 1))
    return (
        dist.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(moved))
        .selectExpr(
            "CAST(shard AS INT) AS shard",
            "n AS n_keys",
            "(n * 1000000) DIV t AS share_ppm",
            f"(mx * {_RING_SHARDS} * 1000000) DIV t AS max_over_mean_ppm",
            "(n_moved * 1000000) DIV n_keys AS moved_ppm",
            f"CAST({exp_ppm} AS BIGINT) AS expected_moved_ppm",
        )
    )
