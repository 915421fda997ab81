"""Extension batch 143 (round 6): Kuiper's test of time-of-day
uniformity (the rotation-invariant KS variant -- the right test for
circular data where a plain KS would depend on where midnight is
drawn; complements circular_seasonality_rayleigh which only sees the
first harmonic), the Newcombe/Wilson score CI for a difference of
proportions (the recommended interval for rate gaps -- the Wald CI
wilson_score_ci's doc warns about breaks down at small counts), and
Nigrini's MAD conformity scale for first-digit Benford (the
practitioner verdict bands that benford_digit_audit's chi-square
lacks: chi-square over-rejects on large n; MAD doesn't).

Cross-engine discipline:
- kuiper_time_of_day buckets events to MINUTES of day (hard 1440
  domain, already saturated at sf0.01 so the growth gate measures it
  flat), exact cumulative counts, the uniform CDF at exact integer
  bucket edges.
- newcombe_risk_diff_ci: weekend/weekday split via engine-native
  dayofweek (labels differ across engines -- CLAUDE.md -- so each side
  uses its own IN-list and the label is never output); Wilson bounds
  are pure doubles over exact counts with the z literal double-cast.
- benford_mad_conformity: expected digit mass ln(1+1/d)/ln(10) over
  the 9-row digit grid; the MAD folds e12-quantized |deviations| so
  the 9-term sum is engine-order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_Z95 = "CAST(1.9599639845400536 AS DOUBLE)"  # NormalDist().inv_cdf(0.975)
_DAY_MIN = 1440


@register(
    "kuiper_time_of_day",
    f"""
    WITH s AS (
      SELECT CAST((epoch_us(ts) // 60000000) % {_DAY_MIN} AS BIGINT) AS sod
      FROM events),
    spine AS (
      SELECT sod, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY sod),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM spine),
    ranked AS (
      SELECT sod, c, sum(c) OVER (ORDER BY sod
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    dist AS (
      SELECT max(CAST(r.cc AS DOUBLE) / t.n
                 - CAST(r.sod AS DOUBLE) / {_DAY_MIN}) AS d_plus,
             max(CAST(r.sod + 1 AS DOUBLE) / {_DAY_MIN}
                 - CAST(r.cc - r.c AS DOUBLE) / t.n) AS d_minus
      FROM ranked r CROSS JOIN nn t)
    SELECT t.n AS n_events,
           round(d.d_plus + d.d_minus, 6) AS kuiper_v,
           round((d.d_plus + d.d_minus)
                 * (sqrt(CAST(t.n AS DOUBLE)) + 0.155
                    + 0.24 / sqrt(CAST(t.n AS DOUBLE))), 6) AS v_star,
           ((d.d_plus + d.d_minus)
             * (sqrt(CAST(t.n AS DOUBLE)) + 0.155
                + 0.24 / sqrt(CAST(t.n AS DOUBLE)))) > 1.747 AS reject_5pct
    FROM dist d CROSS JOIN nn t
    """,
    tags=("stats", "circular", "uniformity"),
)
def q_kuiper_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper's V = D+ + D- for uniformity of event time-of-day
    (minute resolution; the empirical step function is compared
    against the uniform CDF at exact integer bucket edges, so D+ uses
    the bucket's left edge and D- its right edge). V is invariant to
    rotating the clock face -- a midnight-straddling rush hour moves a
    KS D but not V. V* = V(sqrt(n)+0.155+0.24/sqrt(n)) > 1.747 rejects
    uniformity at 5%. The spine is hard-bounded by the 1440-minute
    clock domain."""
    events = read_table(spark, sf_dir, "events")
    s = events.select(
        F.expr(f"CAST((unix_micros(ts) DIV 60000000) % {_DAY_MIN} AS BIGINT)").alias(
            "sod"
        )
    )
    spine = s.groupBy("sod").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    nn = spine.agg(F.sum("c").cast("bigint").alias("n"))
    w = Window.orderBy("sod").rowsBetween(Window.unboundedPreceding, 0)
    ranked = spine.select("sod", "c", F.sum("c").over(w).alias("cc"))
    dist = ranked.crossJoin(F.broadcast(nn)).agg(
        F.max(
            F.col("cc").cast("double") / F.col("n")
            - F.col("sod").cast("double") / _DAY_MIN
        ).alias("d_plus"),
        F.max(
            (F.col("sod") + 1).cast("double") / _DAY_MIN
            - (F.col("cc") - F.col("c")).cast("double") / F.col("n")
        ).alias("d_minus"),
        F.max("n").alias("n_events"),
    )
    v = F.col("d_plus") + F.col("d_minus")
    nd = F.col("n_events").cast("double")
    vstar = v * (F.sqrt(nd) + 0.155 + 0.24 / F.sqrt(nd))
    return dist.select(
        "n_events",
        F.round(v, 6).alias("kuiper_v"),
        F.round(vstar, 6).alias("v_star"),
        (vstar > 1.747).alias("reject_5pct"),
    )


_WILSON = """
    (CAST({x} AS DOUBLE) / {n} + {z} * {z} / (2.0 * {n})
     {sign} {z} * sqrt((CAST({x} AS DOUBLE) / {n})
        * (1.0 - CAST({x} AS DOUBLE) / {n}) / {n}
        + {z} * {z} / (4.0 * {n} * {n})))
    / (1.0 + {z} * {z} / {n})
"""


def _wilson(x: str, n: str, sign: str) -> str:
    return _WILSON.format(x=x, n=n, z=_Z95, sign=sign)


@register(
    "newcombe_risk_diff_ci",
    f"""
    WITH seg AS (
      SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
      FROM events),
    agg AS (
      SELECT CAST(sum(CASE WHEN we = 1 THEN err END) AS BIGINT) AS x1,
             CAST(sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN we = 0 THEN err END) AS BIGINT) AS x2,
             CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM seg)
    SELECT n1 AS n_weekend, x1 AS errors_weekend,
           n2 AS n_weekday, x2 AS errors_weekday,
           round(CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2, 6) + 0.0
             AS risk_diff,
           round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             - sqrt((CAST(x1 AS DOUBLE) / n1 - ({_wilson("x1", "n1", "-")}))
                    * (CAST(x1 AS DOUBLE) / n1 - ({_wilson("x1", "n1", "-")}))
                  + (({_wilson("x2", "n2", "+")}) - CAST(x2 AS DOUBLE) / n2)
                    * (({_wilson("x2", "n2", "+")}) - CAST(x2 AS DOUBLE) / n2)),
             6) + 0.0 AS ci_lo,
           round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             + sqrt((({_wilson("x1", "n1", "+")}) - CAST(x1 AS DOUBLE) / n1)
                    * (({_wilson("x1", "n1", "+")}) - CAST(x1 AS DOUBLE) / n1)
                  + (CAST(x2 AS DOUBLE) / n2 - ({_wilson("x2", "n2", "-")}))
                    * (CAST(x2 AS DOUBLE) / n2 - ({_wilson("x2", "n2", "-")}))),
             6) + 0.0 AS ci_hi
    FROM agg
    """,
    tags=("stats", "inference", "proportions"),
)
def q_newcombe_risk_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newcombe's score interval for the weekend-vs-weekday error-rate
    difference: each proportion gets its Wilson 95% bounds (l_i, u_i),
    and the difference CI is d -/+ sqrt((p1-l1)^2 + (u2-p2)^2) /
    sqrt((u1-p1)^2 + (p2-l2)^2) -- the MOVER construction that stays
    inside [-1, 1] and never degenerates at 0 or 1 like the Wald
    interval. Exact integer counts; the weekend split uses each
    engine's native dayofweek convention (Spark 1=Sun..7, DuckDB
    0=Sun..6), and the label itself is never emitted."""
    events = read_table(spark, sf_dir, "events")
    seg = events.select(
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("we"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("err"),
    )
    agg = seg.agg(
        F.sum(F.when(F.col("we") == 1, F.col("err"))).cast("bigint").alias("x1"),
        F.sum(F.when(F.col("we") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("we") == 0, F.col("err"))).cast("bigint").alias("x2"),
        F.sum(F.when(F.col("we") == 0, 1).otherwise(0)).cast("bigint").alias("n2"),
    )
    lo1 = F.expr(_wilson("x1", "n1", "-"))
    hi1 = F.expr(_wilson("x1", "n1", "+"))
    lo2 = F.expr(_wilson("x2", "n2", "-"))
    hi2 = F.expr(_wilson("x2", "n2", "+"))
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    d = p1 - p2
    return agg.select(
        F.col("n1").alias("n_weekend"),
        F.col("x1").alias("errors_weekend"),
        F.col("n2").alias("n_weekday"),
        F.col("x2").alias("errors_weekday"),
        (F.round(d, 6) + F.lit(0.0)).alias("risk_diff"),
        (
            F.round(
                d - F.sqrt((p1 - lo1) * (p1 - lo1) + (hi2 - p2) * (hi2 - p2)), 6
            )
            + F.lit(0.0)
        ).alias("ci_lo"),
        (
            F.round(
                d + F.sqrt((hi1 - p1) * (hi1 - p1) + (p2 - lo2) * (p2 - lo2)), 6
            )
            + F.lit(0.0)
        ).alias("ci_hi"),
    )


@register(
    "benford_mad_conformity",
    """
    WITH t AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                         AS VARCHAR), 1, 1) AS INTEGER) AS d1
      FROM orders WHERE o_totalprice > 0),
    obs AS (
      SELECT d1, CAST(count(*) AS BIGINT) AS n_d FROM t GROUP BY d1),
    nn AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM obs),
    grid AS (SELECT unnest(range(1, 10)) AS d),
    dev AS (
      SELECT g.d, coalesce(o.n_d, 0) AS n_d,
             CAST(coalesce(o.n_d, 0) AS DOUBLE) / t.n AS obs_prop,
             ln(1.0 + 1.0 / g.d) / ln(10.0) AS exp_prop,
             CAST(floor(abs(CAST(coalesce(o.n_d, 0) AS DOUBLE) / t.n
                            - ln(1.0 + 1.0 / g.d) / ln(10.0)) * 1e12 + 0.5)
                  AS BIGINT) AS dev_e12
      FROM grid g LEFT JOIN obs o ON o.d1 = g.d CROSS JOIN nn t),
    mad AS (
      SELECT CAST(sum(dev_e12) AS BIGINT) AS s FROM dev)
    SELECT d.d AS digit, d.n_d,
           round(d.obs_prop, 6) AS observed_prop,
           round(d.exp_prop, 6) AS benford_prop,
           round(CAST(m.s AS DOUBLE) / 9.0 / 1e12, 6) AS mad,
           CASE WHEN m.s / 9.0 / 1e12 < 0.006 THEN 'close'
                WHEN m.s / 9.0 / 1e12 < 0.012 THEN 'acceptable'
                WHEN m.s / 9.0 / 1e12 < 0.015 THEN 'marginal'
                ELSE 'nonconformity' END AS nigrini_verdict
    FROM dev d CROSS JOIN mad m
    ORDER BY d.d
    """,
    tags=("fraud", "forensic", "benford"),
)
def q_benford_mad_conformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nigrini's MAD conformity test for first-digit Benford on order
    amounts: mean absolute deviation of the 9 observed digit
    proportions from log10(1 + 1/d), with the published verdict bands
    (< 0.006 close, < 0.012 acceptable, < 0.015 marginal, else
    nonconformity) -- the scale auditors actually use because the
    chi-square rejects everything once n is large. Per-digit
    deviations are e12-quantized so the 9-term MAD sum is exact; the
    first digit of the cent amount equals the first significant digit
    of the dollar amount (x100 never changes the leading digit)."""
    orders = read_table(spark, sf_dir, "orders")
    t = orders.where(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("integer")
        .alias("d1")
    )
    obs = t.groupBy("d1").agg(F.count(F.lit(1)).cast("bigint").alias("n_d"))
    nn = obs.agg(F.sum("n_d").cast("bigint").alias("n"))
    grid = spark.range(1, 10).select(F.col("id").cast("integer").alias("d"))
    exp_prop = F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))
    dev = (
        grid.join(F.broadcast(obs), grid.d == obs.d1, "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "d",
            F.coalesce(F.col("n_d"), F.lit(0)).cast("bigint").alias("n_d"),
            (F.coalesce(F.col("n_d"), F.lit(0)).cast("double") / F.col("n")).alias(
                "obs_prop"
            ),
            exp_prop.alias("exp_prop"),
        )
        .withColumn(
            "dev_e12",
            F.floor(
                F.abs(F.col("obs_prop") - F.col("exp_prop")) * 1e12 + 0.5
            ).cast("bigint"),
        )
    )
    mad = dev.agg(F.sum("dev_e12").cast("bigint").alias("s"))
    madv = F.col("s").cast("double") / 9.0 / 1e12
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            F.col("d").alias("digit"),
            "n_d",
            F.round(F.col("obs_prop"), 6).alias("observed_prop"),
            F.round(F.col("exp_prop"), 6).alias("benford_prop"),
            F.round(madv, 6).alias("mad"),
            F.when(madv < 0.006, "close")
            .when(madv < 0.012, "acceptable")
            .when(madv < 0.015, "marginal")
            .otherwise("nonconformity")
            .alias("nigrini_verdict"),
        )
        .orderBy("digit")
    )
