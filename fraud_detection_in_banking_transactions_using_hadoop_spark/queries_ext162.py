"""Extension batch 162 (round 6): three more fraud/AML screens over
the payment graph (customer -> supplier through lineitem x orders) --
mule fan-in (a receiving account suddenly collecting from many
distinct senders in one week: the money-mule aggregation signature
that structuring_detection's per-SENDER view cannot see), the
new-beneficiary burst (a first-ever counterparty paired with an
amount far above the payer's history: the authorized-push-payment
fraud signature), and the second-digit Benford test (Nigrini's
second-order screen: manipulated numbers often pass the first-digit
test but fail the second).

Cross-engine discipline:
- Amounts fold as exact integer cents; z-scores derive from exact
  integer moments and order by their e6-quantized integer image
  (deterministic LIMIT selection).
- Week buckets: date_trunc('week') in both engines (Monday start,
  ext108 precedent), output as DATE.
- Second digits come from the string render of the cents BIGINT
  (identical bytes both engines; no float log10 near power-of-ten
  boundaries -- the benford_digit_audit precedent); expected Benford
  second-digit probabilities are shared Python literals; chi-square
  terms e9-quantize before the cross-digit sum.

Scale notes: everything is one groupBy over the payment fact table
plus a broadcast of per-customer moments; no self-joins, no windows
over raw facts. The fan-in screen's distinct-sender count is the only
distinct aggregate -- keyed by (supplier, week), the natural shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_SMALL_CENTS = 500_000  # $5,000: 'small payment' literal for fan-in mix
_Z_FLAG = 2.0

# Benford second-digit law: P(d2) = sum_{d1=1..9} log10(1 + 1/(10 d1 + d2))
_P2 = tuple(
    sum(math.log10(1.0 + 1.0 / (10 * d1 + d2)) for d1 in range(1, 10))
    for d2 in range(10)
)
_CHI2_CRIT_9DF = 16.918977604620448  # 95th percentile, 9 df


@register(
    "mule_fan_in",
    """
    WITH pay AS (
      SELECT l_suppkey AS recv, o_custkey AS sender,
             date_trunc('week', o_orderdate) AS wk,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    agg AS (
      SELECT recv, CAST(wk AS DATE) AS wk,
             CAST(count(DISTINCT sender) AS BIGINT) AS n_senders,
             CAST(count(*) AS BIGINT) AS n_payments,
             CAST(sum(cents) AS HUGEINT) AS tot_cents,
             CAST(sum(CASE WHEN cents < 500000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small
      FROM pay GROUP BY recv, wk)
    SELECT recv AS suppkey, strftime(wk, '%Y-%m-%d') AS week_start,
           n_senders, n_payments,
           CAST(tot_cents // 100 AS BIGINT) AS total_dollars,
           round(CAST(n_small AS DOUBLE) / n_payments, 6) AS small_share
    FROM agg
    ORDER BY n_senders DESC, tot_cents DESC, recv, wk
    LIMIT 10
    """,
    tags=("fraud", "aml", "mule"),
)
def q_mule_fan_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money-mule fan-in screen: for each receiving supplier and week,
    the count of DISTINCT paying customers, the payment count, total
    dollars, and the share of payments under the $5k 'small' literal.
    A mule collection account shows many distinct senders of small
    amounts inside one window -- the inverse of structuring_detection's
    one-sender-many-slices view. Top-10 by fan-in with exact integer
    tiebreaks; one shuffle keyed (supplier, week)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    pay = lineitem.join(
        orders, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(
        F.col("l_suppkey").alias("recv"),
        F.col("o_custkey").alias("sender"),
        F.date_trunc("week", "o_orderdate").alias("wk"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
    )
    agg = pay.groupBy("recv", F.col("wk").cast("date").alias("wk")).agg(
        F.countDistinct("sender").cast("bigint").alias("n_senders"),
        F.count(F.lit(1)).cast("bigint").alias("n_payments"),
        F.sum("cents").cast(_DEC).alias("tot_cents"),
        F.sum(F.when(F.col("cents") < _SMALL_CENTS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_small"),
    )
    return (
        agg.orderBy(
            F.col("n_senders").desc(),
            F.col("tot_cents").desc(),
            "recv",
            "wk",
        )
        .limit(10)
        .select(
            F.col("recv").alias("suppkey"),
            F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
            "n_senders",
            "n_payments",
            F.expr("CAST(tot_cents DIV 100 AS BIGINT)").alias(
                "total_dollars"
            ),
            F.round(
                F.col("n_small").cast("double") / F.col("n_payments"), 6
            ).alias("small_share"),
        )
    )


@register(
    "new_beneficiary_burst",
    f"""
    WITH pay AS (
      SELECT o_custkey AS cust, l_suppkey AS supp, o_orderdate AS d,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    hist AS (
      SELECT cust, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS s1,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
      FROM pay GROUP BY cust),
    firstd AS (
      SELECT cust, supp, min(d) AS fd FROM pay GROUP BY cust, supp),
    firstpay AS (
      SELECT p.cust, p.supp, f.fd,
             CAST(sum(p.cents) AS HUGEINT) AS day_cents
      FROM pay p JOIN firstd f
        ON f.cust = p.cust AND f.supp = p.supp AND p.d = f.fd
      GROUP BY p.cust, p.supp, f.fd),
    scored AS (
      SELECT fp.cust, fp.supp, fp.fd, fp.day_cents, h.n,
             CASE WHEN h.n * h.s2 - h.s1 * h.s1 > 0 THEN
               (CAST(fp.day_cents AS DOUBLE) - CAST(h.s1 AS DOUBLE) / h.n)
                 / (sqrt(CAST(h.n * h.s2 - h.s1 * h.s1 AS DOUBLE)) / h.n)
             END AS z
      FROM firstpay fp JOIN hist h ON h.cust = fp.cust),
    flagged AS (
      SELECT *, CAST(floor(z * 1e6 + 0.5) AS BIGINT) AS z_e6
      FROM scored WHERE z IS NOT NULL AND z > {_Z_FLAG!r}),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_first,
             CAST(sum(CASE WHEN z IS NOT NULL AND z > {_Z_FLAG!r}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
      FROM scored)
    SELECT t.n_first AS n_first_pairs, t.n_flagged,
           f.cust AS custkey, f.supp AS suppkey, f.fd AS first_date,
           CAST(f.day_cents // 100 AS BIGINT) AS first_day_dollars,
           round(CAST(f.z_e6 AS DOUBLE) / 1e6, 6) AS z
    FROM flagged f CROSS JOIN tot t
    ORDER BY f.z_e6 DESC, f.cust, f.supp
    LIMIT 10
    """,
    tags=("fraud", "aml", "beneficiary"),
)
def q_new_beneficiary_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authorized-push-payment screen: a customer's FIRST day of
    payments to a never-before-seen supplier, z-scored against that
    customer's full per-line payment history (exact integer moments,
    stddev_pop). z > 2 with a brand-new counterparty is the classic
    APP-fraud / invoice-redirect signature. Deterministic selection:
    flagged rows order by the e6-quantized z. Customers with zero
    payment variance are excluded (z undefined)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    pay = lineitem.join(
        orders, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(
        F.col("o_custkey").alias("cust"),
        F.col("l_suppkey").alias("supp"),
        F.col("o_orderdate").alias("d"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
    )
    hist = pay.groupBy("cust").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast(_DEC).alias("s1"),
        F.sum(F.col("cents").cast(_DEC) * F.col("cents")).cast(_DEC).alias(
            "s2"
        ),
    )
    firstd = pay.groupBy("cust", "supp").agg(F.min("d").alias("fd"))
    firstpay = (
        pay.join(
            firstd.select(
                F.col("cust").alias("fc"),
                F.col("supp").alias("fs"),
                "fd",
            ),
            (F.col("fc") == F.col("cust"))
            & (F.col("fs") == F.col("supp"))
            & (F.col("d") == F.col("fd")),
        )
        .groupBy("cust", "supp", "fd")
        .agg(F.sum("cents").cast(_DEC).alias("day_cents"))
    )
    var_n2 = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    z = F.when(
        var_n2 > 0,
        (
            F.col("day_cents").cast("double")
            - F.col("s1").cast("double") / F.col("n")
        )
        / (F.sqrt(var_n2.cast("double")) / F.col("n")),
    )
    scored = firstpay.join(
        hist.select(F.col("cust").alias("hc"), "n", "s1", "s2"),
        F.col("hc") == F.col("cust"),
    ).select("cust", "supp", "fd", "day_cents", "n", z.alias("z"))
    flagged = scored.where(
        F.col("z").isNotNull() & (F.col("z") > _Z_FLAG)
    ).select(
        "*", F.floor(F.col("z") * 1e6 + 0.5).cast("bigint").alias("z_e6")
    )
    tot = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_first"),
        F.sum(
            F.when(F.col("z").isNotNull() & (F.col("z") > _Z_FLAG), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_flagged"),
    )
    return (
        flagged.crossJoin(F.broadcast(tot))
        .orderBy(F.col("z_e6").desc(), "cust", "supp")
        .limit(10)
        .select(
            F.col("n_first").alias("n_first_pairs"),
            "n_flagged",
            F.col("cust").alias("custkey"),
            F.col("supp").alias("suppkey"),
            F.col("fd").alias("first_date"),
            F.expr("CAST(day_cents DIV 100 AS BIGINT)").alias(
                "first_day_dollars"
            ),
            F.round(F.col("z_e6").cast("double") / 1e6, 6).alias("z"),
        )
    )


@register(
    "benford_second_digit",
    f"""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders),
    digits AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 2, 1) AS INTEGER) AS d2
      FROM v WHERE cents >= 10),
    counts AS (
      SELECT d2, CAST(count(*) AS BIGINT) AS n_obs FROM digits GROUP BY d2),
    grid AS (
      SELECT unnest(range(0, 10)) AS d2,
             unnest([{', '.join(repr(p) for p in _P2)}]) AS p_exp),
    filled AS (
      SELECT g.d2, g.p_exp, coalesce(c.n_obs, 0) AS n_obs
      FROM grid g LEFT JOIN counts c ON c.d2 = g.d2),
    tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM filled),
    terms AS (
      SELECT f.d2, f.p_exp, f.n_obs, t.n,
             CAST(floor((CAST(f.n_obs AS DOUBLE) - t.n * f.p_exp)
                  * (CAST(f.n_obs AS DOUBLE) - t.n * f.p_exp)
                  / (t.n * f.p_exp) * 1e9 + 0.5) AS BIGINT) AS chi_e9,
             CAST(floor(abs(CAST(f.n_obs AS DOUBLE) / t.n - f.p_exp)
                  * 1e12 + 0.5) AS BIGINT) AS dev_e12
      FROM filled f CROSS JOIN tot t),
    sums AS (
      SELECT CAST(sum(chi_e9) AS HUGEINT) AS chi2_e9,
             CAST(sum(dev_e12) AS HUGEINT) AS mad10_e12
      FROM terms)
    SELECT tm.d2 AS second_digit, tm.n_obs,
           round(CAST(tm.n_obs AS DOUBLE) / tm.n, 6) AS share,
           round(tm.p_exp, 6) AS benford_p,
           round(CAST(s.chi2_e9 AS DOUBLE) / 1e9, 4) AS chi2,
           round(CAST(s.mad10_e12 AS DOUBLE) / 1e12 / 10.0, 6) AS mad,
           CAST(s.chi2_e9 AS DOUBLE) / 1e9 > {_CHI2_CRIT_9DF!r}
             AS reject_5pct
    FROM terms tm CROSS JOIN sums s
    ORDER BY tm.d2
    """,
    tags=("fraud", "benford", "audit"),
)
def q_benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nigrini's second-order Benford screen on order totals: the
    SECOND significant digit of the cents integer (string render, no
    float log10) against P(d2) = sum_d1 log10(1 + 1/(10 d1 + d2)) --
    a flatter law (p0 = 0.120 down to p9 = 0.085) that catches
    fabricated numbers tuned to pass the first-digit test. Emits the
    10-digit profile plus the chi-square (9 df, 95% critical literal)
    and the mean absolute deviation; chi/dev terms e9/e12-quantize
    before their sums."""
    orders = read_table(spark, sf_dir, "orders")
    v = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents")
    )
    digits = v.where(F.col("cents") >= 10).select(
        F.substring(F.col("cents").cast("string"), 2, 1)
        .cast("integer")
        .alias("d2")
    )
    counts = digits.groupBy("d2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    grid = spark.createDataFrame(
        [(d, p) for d, p in enumerate(_P2)], "d2 INT, p_exp DOUBLE"
    )
    filled = (
        grid.join(counts, "d2", "left")
        .select(
            "d2", "p_exp", F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs")
        )
    )
    tot = filled.agg(F.sum("n_obs").cast("bigint").alias("n"))
    nd = F.col("n_obs").cast("double")
    chi_term = F.floor(
        (nd - F.col("n") * F.col("p_exp"))
        * (nd - F.col("n") * F.col("p_exp"))
        / (F.col("n") * F.col("p_exp"))
        * 1e9
        + 0.5
    ).cast("bigint")
    dev_term = F.floor(
        F.abs(nd / F.col("n") - F.col("p_exp")) * 1e12 + 0.5
    ).cast("bigint")
    terms = filled.crossJoin(F.broadcast(tot)).select(
        "d2",
        "p_exp",
        "n_obs",
        "n",
        chi_term.alias("chi_e9"),
        dev_term.alias("dev_e12"),
    )
    sums = terms.agg(
        F.sum("chi_e9").cast(_DEC).alias("chi2_e9"),
        F.sum("dev_e12").cast(_DEC).alias("mad10_e12"),
    )
    return (
        terms.crossJoin(F.broadcast(sums))
        .orderBy("d2")
        .select(
            F.col("d2").alias("second_digit"),
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias(
                "share"
            ),
            F.round(F.col("p_exp"), 6).alias("benford_p"),
            F.round(F.col("chi2_e9").cast("double") / 1e9, 4).alias("chi2"),
            F.round(
                F.col("mad10_e12").cast("double") / 1e12 / 10.0, 6
            ).alias("mad"),
            (
                F.col("chi2_e9").cast("double") / 1e9 > _CHI2_CRIT_9DF
            ).alias("reject_5pct"),
        )
    )
