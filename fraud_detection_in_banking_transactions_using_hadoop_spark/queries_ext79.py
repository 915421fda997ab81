"""Extension batch 79: distributional distances and count smoothing --
energy distance, CRPS of an empirical ensemble, Good-Turing adjusted
counts, and an exact two-sample Kolmogorov-Smirnov.

wasserstein_price_gap (ext61) measures ONE distance; this batch adds
the complementary family: energy distance (rotation-invariant,
metric-based two-sample separation), CRPS (the proper scoring rule
for DISTRIBUTIONAL forecasts -- pinball_loss_dow scores three
quantiles, CRPS scores the whole CDF), Good-Turing (the classical
unseen-mass estimator every LM smoothing scheme builds on), and KS
(max CDF gap with an EXACT integer argmax -- no epsilon anywhere).

Exactness backbone: sums of |x - y| over pairs NEVER enumerate pairs.
On a value spine sorted ascending, the pairs-below contribution of a
value v with count c is c * (B * v - S) where B/S are the exclusive
prefix count/mass -- both from with_global_rank prefix sums, all
integers. Per-day CRPS terms are e4-scaled integers before the
cross-day sum (the float-sum-order rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_TEST_DAYS = 91
_GT_MAX_R = 10


# ---------------------------------------------------------------------------
# Energy distance between R and A return-flag line prices.
# ---------------------------------------------------------------------------
@register(
    "energy_distance",
    """
    WITH vals AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS arm,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v
      FROM lineitem WHERE l_returnflag IN ('R', 'A')),
    spine AS (
      SELECT v,
             CAST(sum(arm) AS BIGINT) AS c1,
             CAST(count(*) - sum(arm) AS BIGINT) AS c0,
             CAST(sum(CAST(arm AS BIGINT) * v) AS BIGINT) AS m1,
             CAST(sum(CAST(1 - arm AS BIGINT) * v) AS BIGINT) AS m0
      FROM vals GROUP BY v),
    pre AS (
      SELECT v, c1, c0,
             coalesce(sum(c1) OVER w, 0) AS b1,
             coalesce(sum(c0) OVER w, 0) AS b0,
             coalesce(sum(m1) OVER w, 0) AS s1,
             coalesce(sum(m0) OVER w, 0) AS s0
      FROM spine
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING)),
    sums AS (
      SELECT CAST(sum(c1) AS HUGEINT) AS n1,
             CAST(sum(c0) AS HUGEINT) AS n0,
             CAST(sum(CAST(c1 AS HUGEINT) * (b0 * v - s0)
                      + CAST(c0 AS HUGEINT) * (b1 * v - s1)) AS HUGEINT)
               AS sxy,
             CAST(sum(CAST(c1 AS HUGEINT) * (b1 * v - s1)) AS HUGEINT) AS sxx,
             CAST(sum(CAST(c0 AS HUGEINT) * (b0 * v - s0)) AS HUGEINT) AS syy
      FROM pre),
    c AS (
      SELECT CAST(n1 AS BIGINT) AS n_r, CAST(n0 AS BIGINT) AS n_a,
             CAST(sxy AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))
               AS a,
             2.0 * CAST(sxx AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS b,
             2.0 * CAST(syy AS DOUBLE)
               / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE)) AS cc
      FROM sums)
    SELECT n_r, n_a,
           round(a / 100.0, 4) AS mean_abs_gap_dollars,
           round((2.0 * a - b - cc) / 100.0, 4) + 0.0 AS energy_dist_dollars,
           round((2.0 * a - b - cc) / (2.0 * a), 6) + 0.0 AS e_coefficient
    FROM c
    """,
    tags=("stats", "distance", "exact-arith"),
)
def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Szekely's energy distance D^2 = 2 E|X-Y| - E|X-X'| - E|Y-Y'|
    between returned (R) and A-flag line prices: every pairwise
    |difference| sum closes over the value spine's exclusive prefix
    counts/masses (c * (B*v - S)), so the three V-statistics are exact
    integer ratios -- no pair join, no sampling. The e-coefficient
    D^2 / 2E|X-Y| in [0,1] is the normalized separation."""
    li = read_table(spark, sf_dir, "lineitem")
    vals = li.where(F.col("l_returnflag").isin("R", "A")).select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("arm"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("v"),
    )
    spine = vals.groupBy("v").agg(
        F.sum("arm").cast("bigint").alias("c1"),
        (F.count(F.lit(1)) - F.sum("arm")).cast("bigint").alias("c0"),
        F.sum(F.col("arm").cast("bigint") * F.col("v")).cast("bigint").alias("m1"),
        F.sum((1 - F.col("arm")).cast("bigint") * F.col("v"))
        .cast("bigint")
        .alias("m0"),
    )
    pre = with_global_rank(
        spine,
        "v",
        [F.col("v")],
        prefix_sum={"cb1": "c1", "cb0": "c0", "sb1": "m1", "sb0": "m0"},
        bucket_bits=16,  # cent domain: DIV buckets, no stats pass (r13)
    ).select(
        "v",
        "c1",
        "c0",
        (F.col("cb1") - F.col("c1")).alias("b1"),
        (F.col("cb0") - F.col("c0")).alias("b0"),
        (F.col("sb1") - F.col("m1")).alias("s1"),
        (F.col("sb0") - F.col("m0")).alias("s0"),
    )
    c1d, c0d = F.col("c1").cast(_DEC), F.col("c0").cast(_DEC)
    vd = F.col("v").cast(_DEC)
    sums = pre.agg(
        F.sum("c1").cast(_DEC).alias("n1"),
        F.sum("c0").cast(_DEC).alias("n0"),
        F.sum(
            c1d * (F.col("b0").cast(_DEC) * vd - F.col("s0").cast(_DEC))
            + c0d * (F.col("b1").cast(_DEC) * vd - F.col("s1").cast(_DEC))
        )
        .cast(_DEC)
        .alias("sxy"),
        F.sum(c1d * (F.col("b1").cast(_DEC) * vd - F.col("s1").cast(_DEC)))
        .cast(_DEC)
        .alias("sxx"),
        F.sum(c0d * (F.col("b0").cast(_DEC) * vd - F.col("s0").cast(_DEC)))
        .cast(_DEC)
        .alias("syy"),
    )
    n1d, n0d = F.col("n1").cast("double"), F.col("n0").cast("double")
    a = F.col("sxy").cast("double") / (n1d * n0d)
    b = 2.0 * F.col("sxx").cast("double") / (n1d * n1d)
    cc = 2.0 * F.col("syy").cast("double") / (n0d * n0d)
    c = sums.select(
        F.col("n1").cast("bigint").alias("n_r"),
        F.col("n0").cast("bigint").alias("n_a"),
        a.alias("a"),
        b.alias("b"),
        cc.alias("cc"),
    )
    return c.select(
        "n_r",
        "n_a",
        F.round(F.col("a") / 100.0, 4).alias("mean_abs_gap_dollars"),
        (
            F.round((2.0 * F.col("a") - F.col("b") - F.col("cc")) / 100.0, 4) + 0.0
        ).alias("energy_dist_dollars"),
        (
            F.round(
                (2.0 * F.col("a") - F.col("b") - F.col("cc")) / (2.0 * F.col("a")), 6
            )
            + 0.0
        ).alias("e_coefficient"),
    )


# ---------------------------------------------------------------------------
# CRPS of the per-weekday empirical ensemble on the test window.
# ---------------------------------------------------------------------------
@register(
    "crps_ensemble",
    f"""
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate),
    cutoff AS (SELECT max(dt) - INTERVAL {_TEST_DAYS} DAY AS co FROM d),
    marked AS (
      SELECT dt, y, dayofweek(dt) % 7 AS dow,
             dt > (SELECT co FROM cutoff) AS is_test
      FROM d),
    train AS (SELECT dow, y AS x FROM marked WHERE NOT is_test),
    pairterm AS (
      SELECT a.dow,
             CAST(sum(CAST(abs(a.x - b.x) AS HUGEINT)) AS HUGEINT) AS p2
      FROM train a JOIN train b ON a.dow = b.dow
      GROUP BY a.dow),
    msize AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS m FROM train GROUP BY dow),
    perday AS (
      SELECT t.dt, t.dow, s.m,
             CAST(sum(CAST(abs(tr.x - t.y) AS HUGEINT)) AS HUGEINT) AS s1
      FROM marked t
      JOIN train tr ON tr.dow = t.dow
      JOIN msize s ON s.dow = t.dow
      WHERE t.is_test
      GROUP BY t.dt, t.dow, s.m),
    scored AS (
      SELECT p.dt,
             CAST(floor(1e4 * (CAST(p.s1 AS DOUBLE) * p.m
                               - CAST(q.p2 AS DOUBLE) / 2.0)
                        / (CAST(p.m AS DOUBLE) * p.m) + 0.5) AS BIGINT)
               AS crps_e4
      FROM perday p JOIN pairterm q ON p.dow = q.dow)
    SELECT CAST(count(*) AS BIGINT) AS n_test_days,
           round(CAST(sum(crps_e4) AS DOUBLE) / count(*) / 1e4 / 100.0, 4)
             AS avg_crps_dollars
    FROM scored
    """,
    tags=("forecast", "proper-scoring", "exact-arith"),
)
def q_crps_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous Ranked Probability Score of the per-weekday
    empirical train ensemble on the 91 test days: CRPS(F_m, y) =
    mean|x_i - y| - (1/2m^2) sum_ij |x_i - x_j|. Both terms are exact
    integer sums (the calendar-bounded dow pair join saturates at
    ~(days/7)^2 rows per weekday); each day's CRPS is e4-scaled to an
    integer before the cross-day average. The full-CDF counterpart of
    pinball_loss_dow -- this is THE metric for ensemble forecasts."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("y")
    )
    cutoff = d.agg(F.date_sub(F.max("dt"), _TEST_DAYS).alias("co"))
    marked = d.crossJoin(F.broadcast(cutoff)).select(
        "dt",
        "y",
        (F.dayofweek("dt") % 7).alias("dow"),
        (F.col("dt") > F.col("co")).alias("is_test"),
    )
    train = marked.where(~F.col("is_test")).select("dow", F.col("y").alias("x"))
    ta, tb = train.alias("a"), train.alias("b")
    pairterm = (
        ta.join(tb, "dow")
        .select("dow", F.abs(F.col("a.x") - F.col("b.x")).cast(_DEC).alias("ad"))
        .groupBy("dow")
        .agg(F.sum("ad").cast(_DEC).alias("p2"))
    )
    msize = train.groupBy("dow").agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    perday = (
        marked.where(F.col("is_test"))
        .join(train, "dow")
        .groupBy("dt", "dow")
        .agg(F.sum(F.abs(F.col("x") - F.col("y")).cast(_DEC)).cast(_DEC).alias("s1"))
        .join(F.broadcast(msize), "dow")
    )
    scored = perday.join(F.broadcast(pairterm), "dow").select(
        "dt",
        F.floor(
            F.lit(1e4)
            * (
                F.col("s1").cast("double") * F.col("m")
                - F.col("p2").cast("double") / 2.0
            )
            / (F.col("m").cast("double") * F.col("m"))
            + 0.5
        )
        .cast("bigint")
        .alias("crps_e4"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_days"),
        F.round(
            F.sum("crps_e4").cast("double") / F.count(F.lit(1)) / 1e4 / 100.0, 4
        ).alias("avg_crps_dollars"),
    )


# ---------------------------------------------------------------------------
# Good-Turing adjusted counts from token frequencies-of-frequencies.
# ---------------------------------------------------------------------------
@register(
    "good_turing_counts",
    f"""
    WITH docs AS (
      SELECT string_split(text, ' ') AS w FROM documents),
    toks AS (
      SELECT w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tok
      FROM docs, (SELECT unnest(range(1, 100000)) AS i) ix
      WHERE i + 2 <= len(w)),
    tf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
    fof AS (
      SELECT c AS r, CAST(count(*) AS BIGINT) AS nr FROM tf GROUP BY c),
    tot AS (
      SELECT CAST(sum(r * nr) AS BIGINT) AS n_tokens,
             CAST(sum(nr) AS BIGINT) AS n_types
      FROM fof)
    SELECT CAST(a.r AS BIGINT) AS r,
           a.nr AS n_types_at_r,
           round(CAST(a.r + 1 AS DOUBLE) * b.nr / a.nr, 6) AS r_star,
           round(CAST(a.r + 1 AS DOUBLE) * b.nr / a.nr / a.r, 6)
             AS discount_ratio,
           round(CAST((SELECT nr FROM fof WHERE r = 1) AS DOUBLE)
                 / (SELECT n_tokens FROM tot), 6) AS p0_unseen_mass
    FROM fof a JOIN fof b ON b.r = a.r + 1
    WHERE a.r <= {_GT_MAX_R}
    ORDER BY a.r
    """,
    tags=("text", "smoothing", "exact-arith"),
)
def q_good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing adjusted counts r* = (r+1) N_{{r+1}} / N_r for
    TRIGRAM frequencies r = 1..10, plus the unseen-probability mass
    P0 = N_1/N. Trigrams (map-side position explode + element_at, the
    bigram_lm_score idiom -- the corpus' 31-word unigram vocabulary
    has no rare types, trigrams follow a proper Zipf tail with
    N_1 ~ 9.4k at sf0.01) feed a frequencies-of-frequencies table
    bounded by the max trigram count; the r -> r+1 lookup is a
    self-equi-join and every ratio is exact integers. The foundation
    of Katz/Simple-GT smoothing."""
    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(F.split("text", " ").alias("w")).filter(F.size("w") >= 3)
    toks = base.select(
        "w", F.explode(F.sequence(F.lit(1), F.size("w") - 2)).alias("i")
    ).select(
        F.concat_ws(
            " ",
            F.element_at("w", F.col("i")),
            F.element_at("w", F.col("i") + 1),
            F.element_at("w", F.col("i") + 2),
        ).alias("tok")
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    fof = tf.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nr")
    )
    tot = fof.agg(
        F.sum(F.col("r") * F.col("nr")).cast("bigint").alias("n_tokens"),
    )
    n1 = fof.where(F.col("r") == 1).select(F.col("nr").alias("n1"))
    a, b = fof.alias("a"), fof.alias("b")
    joined = (
        a.join(b, F.col("b.r") == F.col("a.r") + 1)
        .where(F.col("a.r") <= _GT_MAX_R)
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
    )
    rstar = (F.col("a.r") + 1).cast("double") * F.col("b.nr") / F.col("a.nr")
    return joined.select(
        F.col("a.r").cast("bigint").alias("r"),
        F.col("a.nr").alias("n_types_at_r"),
        F.round(rstar, 6).alias("r_star"),
        F.round(rstar / F.col("a.r"), 6).alias("discount_ratio"),
        F.round(F.col("n1").cast("double") / F.col("n_tokens"), 6).alias(
            "p0_unseen_mass"
        ),
    ).orderBy("r")


# ---------------------------------------------------------------------------
# Exact two-sample KS on account balances across market segments.
# ---------------------------------------------------------------------------
@register(
    "ks_two_sample_acctbal",
    """
    WITH vals AS (
      SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS arm,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS v
      FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
    spine AS (
      SELECT v,
             CAST(sum(arm) AS BIGINT) AS c1,
             CAST(count(*) - sum(arm) AS BIGINT) AS c0
      FROM vals GROUP BY v),
    pre AS (
      SELECT v,
             sum(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc1,
             sum(c0) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc0
      FROM spine),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0
      FROM spine),
    gaps AS (
      SELECT p.v,
             abs(p.cc1 * t.n0 - p.cc0 * t.n1) AS gap_num,
             t.n1, t.n0
      FROM pre p CROSS JOIN tot t)
    SELECT n1 AS n_building, n0 AS n_machinery,
           round(CAST(gap_num AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6) AS ks_stat,
           round(v / 100.0, 2) AS ks_at_dollars,
           round(sqrt(CAST(n1 AS DOUBLE) * n0 / (CAST(n1 AS DOUBLE) + n0))
                 * CAST(gap_num AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)
             AS scaled_ks
    FROM gaps ORDER BY gap_num DESC, v LIMIT 1
    """,
    tags=("stats", "distribution", "exact-arith"),
)
def q_ks_two_sample_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov between BUILDING and
    MACHINERY account-balance distributions: the CDF gap at spine
    value v is |cc1 * n0 - cc0 * n1| / (n1 n0) with an exact INTEGER
    numerator, so the argmax (ordered LIMIT with the value tiebreak)
    is exact -- no float comparison picks the split. scaled_ks =
    sqrt(n1 n0 / (n1+n0)) * KS is the asymptotic test statistic.
    Complements length_drift_ks (documents) on a money-valued axis."""
    cust = read_table(spark, sf_dir, "customer")
    vals = cust.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("arm"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v"),
    )
    spine = vals.groupBy("v").agg(
        F.sum("arm").cast("bigint").alias("c1"),
        (F.count(F.lit(1)) - F.sum("arm")).cast("bigint").alias("c0"),
    )
    pre = with_global_rank(
        spine, "v", [F.col("v")], prefix_sum={"cc1": "c1", "cc0": "c0"},
        bucket_bits=16,  # cent domain (r13)
    ).select("v", "cc1", "cc0")
    tot = spine.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c0").cast("bigint").alias("n0"),
    )
    gaps = pre.crossJoin(F.broadcast(tot)).select(
        "v",
        F.abs(F.col("cc1") * F.col("n0") - F.col("cc0") * F.col("n1")).alias(
            "gap_num"
        ),
        "n1",
        "n0",
    )
    n1d, n0d = F.col("n1").cast("double"), F.col("n0").cast("double")
    return (
        gaps.orderBy(F.col("gap_num").desc(), "v")
        .limit(1)
        .select(
            F.col("n1").alias("n_building"),
            F.col("n0").alias("n_machinery"),
            F.round(F.col("gap_num").cast("double") / (n1d * n0d), 6).alias(
                "ks_stat"
            ),
            F.round(F.col("v") / 100.0, 2).alias("ks_at_dollars"),
            F.round(
                F.sqrt(n1d * F.col("n0") / (n1d + F.col("n0")))
                * F.col("gap_num").cast("double")
                / (n1d * n0d),
                6,
            ).alias("scaled_ks"),
        )
    )
