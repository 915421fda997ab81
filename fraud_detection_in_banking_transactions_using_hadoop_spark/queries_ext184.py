"""Extension batch 184 (round 6): set-sketch algebra, superlative
price indices, and forecast monitoring -- the theta-sketch
INTERSECTION (the set-operation step KMV sketches exist for:
estimate |purchasers AND error-users| from two k-minimum-value
sketches without touching the full sets, printed against the exact
truth), the Fisher ideal index (geometric mean of Laspeyres and
Paasche on the monthly brand unit-value basket -- the superlative
index that cancels the substitution biases of both, completing
tornqvist_price_index / chained_index_drift), and the tracking
signal (cumulative forecast error over MAD for a 7-day-naive
forecast -- the inventory-control monitor whose |TS| > 4 alarm is
decided as an EXACT integer inequality t*|sumE| > 4*sum|E|).

Cross-engine discipline: sketch hashes reuse the 48-bit md5 prefix
convention of kmv_distinct_sketch; intersection/union counts are
exact integers and the only doubles are final ratios of exact
integers; index cross-valuations e3-quantize per brand exactly like
chained_index_drift; tracking-signal numerators/denominators stay
integer cents."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_K_SKETCH = 32
_TWO48 = float(1 << 48)


@register(
    "theta_sketch_intersection",
    f"""
    WITH ua AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    ub AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
    ranked AS (
      SELECT arm, h,
             row_number() OVER (PARTITION BY arm ORDER BY h) AS rk,
             count(*) OVER (PARTITION BY arm) AS cnt
      FROM (
        SELECT 'a' AS arm,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
                 AS h
        FROM ua
        UNION ALL
        SELECT 'b' AS arm,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
                 AS h
        FROM ub) u),
    sk AS (SELECT arm, h, rk, cnt FROM ranked WHERE rk <= {_K_SKETCH}),
    keff AS (
      SELECT least({_K_SKETCH}, CAST(min(cnt) AS BIGINT)) AS k FROM sk),
    ska AS (SELECT h FROM sk CROSS JOIN keff
            WHERE arm = 'a' AND rk <= k),
    skb AS (SELECT h FROM sk CROSS JOIN keff
            WHERE arm = 'b' AND rk <= k),
    theta AS (
      SELECT least((SELECT max(h) FROM ska), (SELECT max(h) FROM skb))
               AS th
      FROM keff),
    inter AS (
      SELECT CAST(count(*) AS BIGINT) AS c
      FROM ska JOIN skb USING (h) CROSS JOIN theta WHERE h < th),
    uni AS (
      SELECT CAST(count(*) AS BIGINT) AS u
      FROM (SELECT h FROM ska UNION SELECT h FROM skb) s
      CROSS JOIN theta WHERE h < th),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS x_inter,
             (SELECT CAST(count(*) AS BIGINT) FROM ua) AS x_a,
             (SELECT CAST(count(*) AS BIGINT) FROM ub) AS x_b
      FROM ua JOIN ub USING (user_id))
    SELECT CAST(k.k AS BIGINT) AS k_eff,
           e.x_inter AS exact_intersection,
           round(i.c * {_TWO48!r} / t.th, 2) AS est_intersection,
           round(CAST(e.x_inter AS DOUBLE)
                 / (e.x_a + e.x_b - e.x_inter), 6) AS exact_jaccard,
           round(CASE WHEN u.u > 0
                      THEN CAST(i.c AS DOUBLE) / u.u ELSE 0.0 END, 6)
             AS est_jaccard
    FROM keff k CROSS JOIN theta t CROSS JOIN inter i
    CROSS JOIN uni u CROSS JOIN exact e
    """,
    tags=("sketch", "set", "theta"),
)
def q_theta_sketch_intersection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theta-sketch intersection between the purchaser and
    error-user sets: keep only the k = 32 smallest 48-bit md5 hashes
    of each set (the kmv_distinct_sketch convention), set theta =
    min of the two k-th values, and estimate |A AND B| as (matching
    hashes below theta) / theta -- the mergeable-set-algebra step a
    KMV sketch exists for, sized in O(k) instead of O(|A|+|B|). The
    sampled Jaccard (C/U over the sub-theta union sample) prints
    beside the exact truth computed from the full sets; k adapts
    down at tiny SF so the sketch is always well-defined."""
    ev = read_table(spark, sf_dir, "events")
    h = F.expr(
        "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 12), 16, 10)"
        " AS BIGINT)"
    )
    ua = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    ub = (
        ev.where(F.col("event_type") == "error")
        .select("user_id")
        .distinct()
    )
    both = ua.select(F.lit("a").alias("arm"), h.alias("h")).unionAll(
        ub.select(F.lit("b").alias("arm"), h.alias("h"))
    )
    w = Window.partitionBy("arm").orderBy("h")
    ranked = both.select(
        "arm",
        "h",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("arm")).alias("cnt"),
    )
    # literal rk <= k filter plans as WindowGroupLimit (per-arm top-k
    # pushdown, the kmv_distinct_sketch shape); the adaptive k_eff
    # then trims within the 32-row subset
    sk = ranked.where(F.col("rk") <= _K_SKETCH)
    keff = sk.agg(
        F.least(
            F.lit(_K_SKETCH).cast("bigint"),
            F.min("cnt").cast("bigint"),
        ).alias("k")
    )
    ska = (
        sk.where(F.col("arm") == "a")
        .crossJoin(F.broadcast(keff))
        .where(F.col("rk") <= F.col("k"))
        .select("h")
    )
    skb = (
        sk.where(F.col("arm") == "b")
        .crossJoin(F.broadcast(keff))
        .where(F.col("rk") <= F.col("k"))
        .select("h")
    )
    theta = (
        ska.agg(F.max("h").alias("tha"))
        .crossJoin(F.broadcast(skb.agg(F.max("h").alias("thb"))))
        .select(F.least("tha", "thb").alias("th"))
    )
    inter = (
        ska.join(skb, on="h")
        .crossJoin(F.broadcast(theta))
        .where(F.col("h") < F.col("th"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    uni = (
        ska.union(skb)
        .distinct()
        .crossJoin(F.broadcast(theta))
        .where(F.col("h") < F.col("th"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("u"))
    )
    exact = (
        ua.join(ub, on="user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x_inter"))
        .crossJoin(
            F.broadcast(
                ua.agg(F.count(F.lit(1)).cast("bigint").alias("x_a"))
            )
        )
        .crossJoin(
            F.broadcast(
                ub.agg(F.count(F.lit(1)).cast("bigint").alias("x_b"))
            )
        )
    )
    return (
        keff.crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(inter))
        .crossJoin(F.broadcast(uni))
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("k").cast("bigint").alias("k_eff"),
            F.col("x_inter").alias("exact_intersection"),
            F.round(
                F.col("c") * F.lit(_TWO48) / F.col("th"), 2
            ).alias("est_intersection"),
            F.round(
                F.col("x_inter").cast("double")
                / (F.col("x_a") + F.col("x_b") - F.col("x_inter")),
                6,
            ).alias("exact_jaccard"),
            F.round(
                F.when(
                    F.col("u") > 0,
                    F.col("c").cast("double") / F.col("u"),
                ).otherwise(0.0),
                6,
            ).alias("est_jaccard"),
        )
    )


@register(
    "fisher_ideal_index",
    """
    WITH bm AS (
      SELECT date_trunc('month', o_orderdate) AS m, p.p_brand AS brand,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q,
             CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS v
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY date_trunc('month', o_orderdate), p.p_brand),
    base AS (
      SELECT brand, q AS q0, v AS v0
      FROM bm WHERE m = (SELECT min(m) FROM bm)),
    pair AS (
      -- e3-quantized cross valuations on the common basket
      SELECT t.m,
             CAST(floor(CAST(t.q0x AS DOUBLE) / t.qt * 1e3 + 0.5)
                  AS BIGINT) AS l_num_e3,
             CAST(floor(CAST(t.v0q AS DOUBLE) / t.q0 * 1e3 + 0.5)
                  AS BIGINT) AS l_den_e3,
             CAST(floor(CAST(t.vtq AS DOUBLE) / t.qt * 1e3 + 0.5)
                  AS BIGINT) AS p_num_e3,
             CAST(floor(CAST(t.v0qt AS DOUBLE) / t.q0 * 1e3 + 0.5)
                  AS BIGINT) AS p_den_e3
      FROM (
        SELECT c.m, b.q0, c.q AS qt,
               CAST(b.q0 AS HUGEINT) * c.v AS q0x,
               CAST(b.q0 AS HUGEINT) * b.v0 AS v0q,
               CAST(c.q AS HUGEINT) * c.v AS vtq,
               CAST(c.q AS HUGEINT) * b.v0 AS v0qt
        FROM bm c JOIN base b ON b.brand = c.brand) t),
    idx AS (
      SELECT m,
             CAST(count(*) AS BIGINT) AS n_brands,
             CAST(sum(l_num_e3) AS HUGEINT) AS ln3,
             CAST(sum(l_den_e3) AS HUGEINT) AS ld3,
             CAST(sum(p_num_e3) AS HUGEINT) AS pn3,
             CAST(sum(p_den_e3) AS HUGEINT) AS pd3
      FROM pair GROUP BY m)
    SELECT strftime(m, '%Y-%m') AS month, n_brands,
           round(CAST(ln3 AS DOUBLE) / CAST(ld3 AS DOUBLE), 6)
             AS laspeyres,
           round(CAST(pn3 AS DOUBLE) / CAST(pd3 AS DOUBLE), 6)
             AS paasche,
           round(sqrt((CAST(ln3 AS DOUBLE) / CAST(ld3 AS DOUBLE))
                      * (CAST(pn3 AS DOUBLE) / CAST(pd3 AS DOUBLE))), 6)
             AS fisher
    FROM idx
    """,
    tags=("economics", "index", "fisher"),
)
def q_fisher_ideal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher ideal price index per month on the brand unit-value
    basket (25 brands -- dense at every SF, unlike a part-key basket):
    Laspeyres weights prices by BASE-month quantities (overstates
    inflation under substitution), Paasche by CURRENT quantities
    (understates it), Fisher = sqrt(L * P) is the superlative
    compromise satisfying the time-reversal test. Unit values are
    exact cent/quantity rationals; each cross-valuation q_a * v_b/q_b
    e3-quantizes per brand (the chained_index_drift discipline)
    before the basket sums; Fisher closes in one IEEE-exact sqrt."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    part = read_table(spark, sf_dir, "part")
    bm = (
        lineitem.join(orders, orders.o_orderkey == lineitem.l_orderkey)
        .join(part, part.p_partkey == lineitem.l_partkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("m"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            )
            .cast("bigint")
            .alias("v"),
        )
    )
    m0 = bm.agg(F.min("m").alias("m0"))
    base = (
        bm.crossJoin(F.broadcast(m0))
        .where(F.col("m") == F.col("m0"))
        .select(
            "brand",
            F.col("q").alias("q0"),
            F.col("v").alias("v0"),
        )
    )
    t = bm.join(base, on="brand").select(
        "m",
        "q0",
        F.col("q").alias("qt"),
        (F.col("q0").cast(_DEC) * F.col("v")).alias("q0x"),
        (F.col("q0").cast(_DEC) * F.col("v0")).alias("v0q"),
        (F.col("q").cast(_DEC) * F.col("v")).alias("vtq"),
        (F.col("q").cast(_DEC) * F.col("v0")).alias("v0qt"),
    )
    e3 = lambda num, den: F.floor(
        num.cast("double") / F.col(den) * 1e3 + 0.5
    ).cast("bigint")
    pair = t.select(
        "m",
        e3(F.col("q0x"), "qt").alias("l_num_e3"),
        e3(F.col("v0q"), "q0").alias("l_den_e3"),
        e3(F.col("vtq"), "qt").alias("p_num_e3"),
        e3(F.col("v0qt"), "q0").alias("p_den_e3"),
    )
    idx = pair.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
        F.sum("l_num_e3").cast(_DEC).alias("ln3"),
        F.sum("l_den_e3").cast(_DEC).alias("ld3"),
        F.sum("p_num_e3").cast(_DEC).alias("pn3"),
        F.sum("p_den_e3").cast(_DEC).alias("pd3"),
    )
    lasp = F.col("ln3").cast("double") / F.col("ld3").cast("double")
    paas = F.col("pn3").cast("double") / F.col("pd3").cast("double")
    return idx.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "n_brands",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


@register(
    "tracking_signal",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    err AS (
      SELECT d, v - lag(v, 7) OVER (ORDER BY d) AS e
      FROM daily),
    cum AS MATERIALIZED (
      SELECT d, e,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
             CAST(sum(e) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS ce,
             CAST(sum(abs(e)) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cae
      FROM err WHERE e IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(max(CASE WHEN t = (SELECT max(t) FROM cum)
                               THEN ce END) AS DOUBLE)
                 / max(CASE WHEN t = (SELECT max(t) FROM cum)
                            THEN t END), 2) + 0.0 AS mean_error_dollars,
           round(max(CAST(t AS DOUBLE) * ce / cae), 6) + 0.0 AS max_ts,
           round(min(CAST(t AS DOUBLE) * ce / cae), 6) + 0.0 AS min_ts,
           CAST(sum(CASE WHEN t * abs(ce) > 4 * cae THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarm_days
    FROM cum
    """,
    tags=("forecast", "monitoring", "tracking"),
)
def q_tracking_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tracking signal of a 7-day-naive forecast of daily revenue:
    TS_t = (cumulative error) / MAD_t where MAD_t is the running mean
    absolute error, i.e. TS_t = t * sumE_t / sumAbsE_t. A forecast
    whose errors are unbiased keeps |TS| < 4; persistent drift walks
    it out -- n_alarm_days counts the breaches with the EXACT integer
    inequality t * |sumE| > 4 * sumAbsE (no division, no float).
    Errors, cumulative sums and MAD numerators are integer dollars
    end to end; the extreme TS values close as ratios of exact
    integers."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    w = Window.orderBy("d")
    err = daily.select(
        "d", (F.col("v") - F.lag("v", 7).over(w)).alias("e")
    ).where(F.col("e").isNotNull())
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = err.select(
        "e",
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias(
            "t"
        ),
        F.sum("e").over(wc).cast("bigint").alias("ce"),
        F.sum(F.abs(F.col("e"))).over(wc).cast("bigint").alias("cae"),
    )
    last = cum.agg(F.max("t").alias("tn"))
    ts = F.col("t").cast("double") * F.col("ce") / F.col("cae")
    return (
        cum.crossJoin(F.broadcast(last))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            (
                F.round(
                    F.max(
                        F.when(F.col("t") == F.col("tn"), F.col("ce"))
                    ).cast("double")
                    / F.max(
                        F.when(F.col("t") == F.col("tn"), F.col("t"))
                    ),
                    2,
                )
                + F.lit(0.0)
            ).alias("mean_error_dollars"),
            (F.round(F.max(ts), 6) + F.lit(0.0)).alias("max_ts"),
            (F.round(F.min(ts), 6) + F.lit(0.0)).alias("min_ts"),
            F.sum(
                F.when(
                    F.col("t") * F.abs(F.col("ce"))
                    > 4 * F.col("cae"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_alarm_days"),
        )
    )
