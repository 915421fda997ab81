"""Extension batch 106: probabilistic-structure calibration -- Bloom
filter FPR (theory vs measured), supplier market-diversification
entropy, and the birthday-collision audit of the md5-bucket idiom.

- bloom_fpr_calibration: bloom_filter_semijoin USES a Bloom filter;
  this query MEASURES one -- k = 3 md5-derived positions per member
  over m bits, probed with true non-members, and the empirical false
  positive rate against the (1 - e^(-kn/m))^k theory line. The gap
  is the honesty check every sketch deployment owes its users.
- supplier_market_entropy: which suppliers are one-customer-nation
  shops and which are diversified? Per-supplier nation-mix Shannon
  entropy (e9-integer p log p terms), reported as effective markets
  exp(H), top-10 + bottom via deterministic ordering.
- birthday_collision_check: the repo's own deterministic-bucket
  idiom hashes keys to 16-bit md5 prefixes; the birthday bound says
  how many bucket collisions that MUST create. Observed pairwise
  collisions (exact sum c(c-1)/2) vs the expected C(n,2)/2^16 --
  validating the tool the pipeline queries lean on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_BLOOM_M = 65536  # bits
_BLOOM_K = 3


def _pos_sql(i: int, col: str) -> str:
    lo = 1 + 4 * i
    return (
        f"('0x' || substr(md5(CAST({col} AS VARCHAR)), {lo}, 4))::BIGINT"
        f" % {_BLOOM_M}"
    )


def _pos_col(i: int, col):
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1 + 4 * i, 4), 16, 10)
        .cast("bigint")
        % _BLOOM_M
    )


# ---------------------------------------------------------------------------
# Bloom filter FPR: theory vs measurement.
# ---------------------------------------------------------------------------
@register(
    "bloom_fpr_calibration",
    f"""
    WITH members AS (
      SELECT DISTINCT o_custkey AS ck FROM orders
      WHERE date_part('year', o_orderdate) = 1996),
    probes AS (
      SELECT DISTINCT o_custkey AS ck FROM orders
      WHERE date_part('year', o_orderdate) = 1997
        AND o_custkey NOT IN (SELECT ck FROM members)),
    bits AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(f"SELECT {_pos_sql(i, 'ck')} AS pos FROM members" for i in range(_BLOOM_K))})),
    probe_pos AS (
      {" UNION ALL ".join(f"SELECT ck, {_pos_sql(i, 'ck')} AS pos FROM probes" for i in range(_BLOOM_K))}),
    hits AS (
      SELECT p.ck, CAST(count(b.pos) AS BIGINT) AS n_hit
      FROM probe_pos p LEFT JOIN bits b ON b.pos = p.pos
      GROUP BY p.ck),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_probes,
             CAST(sum(CASE WHEN n_hit = {_BLOOM_K} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_fp
      FROM hits),
    sizes AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_mem,
             (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set)
    SELECT s.n_mem AS n_members, a.n_probes,
           s.n_bits_set,
           round(CAST(s.n_bits_set AS DOUBLE) / {_BLOOM_M}, 6) AS fill_ratio,
           round(pow(1.0 - exp(-{_BLOOM_K}.0 * s.n_mem / {_BLOOM_M}.0),
                     {_BLOOM_K}.0), 6) AS theory_fpr,
           round(CAST(a.n_fp AS DOUBLE) / a.n_probes, 6) AS empirical_fpr
    FROM agg a CROSS JOIN sizes s
    """,
    tags=("sketch", "calibration", "exact-arith"),
)
def q_bloom_fpr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a {_BLOOM_M}-bit, k={_BLOOM_K} Bloom filter over the 1996
    customers (positions = three disjoint 4-hex-digit md5 slices --
    the repo's cross-engine hash idiom), probe it with the 1997-only
    customers, and compare the measured false-positive rate with the
    (1 - e^(-kn/m))^k formula. The set membership is exact relational
    algebra (distinct positions + a LEFT join), so the measurement is
    itself exactly reproducible."""
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    members = (
        orders.where(F.year("o_orderdate") == 1996)
        .select(F.col("o_custkey").alias("ck"))
        .distinct()
    )
    probes = (
        orders.where(F.year("o_orderdate") == 1997)
        .select(F.col("o_custkey").alias("ck"))
        .distinct()
        .join(members.select(F.col("ck").alias("mk")), F.col("ck") == F.col("mk"), "left_anti")
    )
    bit_frames = [
        members.select(_pos_col(i, F.col("ck")).alias("pos"))
        for i in range(_BLOOM_K)
    ]
    bits = bit_frames[0]
    for bf in bit_frames[1:]:
        bits = bits.unionByName(bf)
    bits = bits.distinct()
    pp_frames = [
        probes.select("ck", _pos_col(i, F.col("ck")).alias("pos"))
        for i in range(_BLOOM_K)
    ]
    probe_pos = pp_frames[0]
    for pf in pp_frames[1:]:
        probe_pos = probe_pos.unionByName(pf)
    hits = (
        probe_pos.join(
            bits.select(F.col("pos").alias("bpos")),
            F.col("pos") == F.col("bpos"),
            "left",
        )
        .groupBy("ck")
        .agg(F.count("bpos").cast("bigint").alias("n_hit"))
    )
    agg = hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.when(F.col("n_hit") == _BLOOM_K, 1).otherwise(0))
        .cast("bigint")
        .alias("n_fp"),
    )
    sizes = members.agg(F.count(F.lit(1)).cast("bigint").alias("n_mem")).crossJoin(
        F.broadcast(bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set")))
    )
    return agg.crossJoin(F.broadcast(sizes)).select(
        F.col("n_mem").alias("n_members"),
        "n_probes",
        "n_bits_set",
        F.round(F.col("n_bits_set").cast("double") / _BLOOM_M, 6).alias(
            "fill_ratio"
        ),
        F.round(
            F.pow(
                1.0 - F.exp(F.lit(-float(_BLOOM_K)) * F.col("n_mem") / _BLOOM_M),
                F.lit(float(_BLOOM_K)),
            ),
            6,
        ).alias("theory_fpr"),
        F.round(F.col("n_fp").cast("double") / F.col("n_probes"), 6).alias(
            "empirical_fpr"
        ),
    )


# ---------------------------------------------------------------------------
# Supplier market-diversification entropy.
# ---------------------------------------------------------------------------
@register(
    "supplier_market_entropy",
    """
    WITH cells AS (
      SELECT l.l_suppkey AS sk, c.c_nationkey AS nk,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY l.l_suppkey, c.c_nationkey),
    tots AS (
      SELECT sk, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY sk),
    ent AS (
      SELECT cl.sk, t.n,
             CAST(sum(CAST(floor(1e9 * (CAST(cl.c AS DOUBLE) / t.n
                                        * ln(CAST(t.n AS DOUBLE) / cl.c))
                                 + 0.5) AS BIGINT)) AS HUGEINT) AS h_e9,
             CAST(count(*) AS BIGINT) AS n_markets
      FROM cells cl JOIN tots t ON cl.sk = t.sk
      GROUP BY cl.sk, t.n)
    SELECT CAST(sk AS BIGINT) AS suppkey,
           n AS n_lines, n_markets,
           round(CAST(h_e9 AS DOUBLE) / 1e9, 4) AS entropy_nats,
           round(exp(CAST(h_e9 AS DOUBLE) / 1e9), 2) AS effective_markets
    FROM ent
    ORDER BY h_e9 DESC, sk LIMIT 10
    """,
    tags=("econ", "diversification", "exact-arith"),
)
def q_supplier_market_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier customer-nation mix entropy (e9-integer p ln(1/p)
    terms summed per supplier) and the effective number of markets
    exp(H): the top-10 most diversified suppliers by the exact
    e9-integer ordering. One-market suppliers carry concentration
    risk no revenue ranking reveals -- the supplier-side mirror of
    concentration_curve_crk."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .groupBy(F.col("l_suppkey").alias("sk"), F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tots = cells.groupBy("sk").agg(F.sum("c").cast("bigint").alias("n"))
    term = F.floor(
        F.lit(1e9)
        * (
            F.col("c").cast("double")
            / F.col("n")
            * F.log(F.col("n").cast("double") / F.col("c"))
        )
        + 0.5
    ).cast("bigint")
    ent = (
        cells.join(tots, "sk")
        .groupBy("sk", "n")
        .agg(
            F.sum(term).cast(_DEC).alias("h_e9"),
            F.count(F.lit(1)).cast("bigint").alias("n_markets"),
        )
    )
    return (
        ent.orderBy(F.col("h_e9").desc(), "sk")
        .limit(10)
        .select(
            F.col("sk").cast("bigint").alias("suppkey"),
            F.col("n").alias("n_lines"),
            "n_markets",
            F.round(F.col("h_e9").cast("double") / 1e9, 4).alias("entropy_nats"),
            F.round(F.exp(F.col("h_e9").cast("double") / 1e9), 2).alias(
                "effective_markets"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Birthday-collision audit of the 16-bit md5 bucket idiom.
# ---------------------------------------------------------------------------
@register(
    "birthday_collision_check",
    """
    WITH keys AS (
      SELECT DISTINCT o_custkey AS ck FROM orders),
    buckets AS (
      SELECT ('0x' || substr(md5(CAST(ck AS VARCHAR)), 1, 4))::BIGINT AS b
      FROM keys),
    per AS (
      SELECT b, CAST(count(*) AS BIGINT) AS c FROM buckets GROUP BY b),
    agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS obs_pairs
      FROM per)
    SELECT n AS n_keys, n_buckets AS n_distinct_buckets,
           obs_pairs AS observed_collision_pairs,
           round(CAST(n AS DOUBLE) * (n - 1) / 2.0 / 65536.0, 2)
             AS expected_collision_pairs,
           round(CAST(obs_pairs AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (n - 1) / 2.0 / 65536.0), 4)
             AS obs_over_expected
    FROM agg
    """,
    tags=("hashing", "audit", "exact-arith"),
)
def q_birthday_collision_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Birthday audit of the repo's own 16-bit md5-prefix bucket
    idiom over the customer keys: observed pairwise collisions
    sum c(c-1)/2 (exact integers) against the birthday expectation
    C(n,2)/2^16. A ratio near 1 certifies the hash behaves uniformly
    on THIS key population -- the due-diligence every
    deterministic-bucket split (train_test_split, kfold_cv_variance)
    silently assumes."""
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    keys = orders.select(F.col("o_custkey").alias("ck")).distinct()
    buckets = keys.select(
        F.conv(F.substring(F.md5(F.col("ck").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        .alias("b")
    )
    per = buckets.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    agg = per.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(F.expr("c * (c - 1) DIV 2")).cast("bigint").alias("obs_pairs"),
    )
    nd = F.col("n").cast("double")
    expected = nd * (F.col("n") - 1) / 2.0 / 65536.0
    return agg.select(
        F.col("n").alias("n_keys"),
        F.col("n_buckets").alias("n_distinct_buckets"),
        F.col("obs_pairs").alias("observed_collision_pairs"),
        F.round(expected, 2).alias("expected_collision_pairs"),
        F.round(F.col("obs_pairs").cast("double") / expected, 4).alias(
            "obs_over_expected"
        ),
    )
