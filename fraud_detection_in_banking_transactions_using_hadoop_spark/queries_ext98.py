"""Extension batch 98: sampling design and competing risks -- Neyman
allocation, the Aalen-Johansen-style cumulative incidence for
competing events, and monetary-unit (PPS) audit sampling.

- neyman_allocation: stratified_sample DRAWS a sample; Neyman says
  how big each stratum's share SHOULD be (n_h proportional to
  N_h S_h) and how much variance that saves vs proportional
  allocation. Per-stratum weights are e6-floored integers before the
  share normalization (float-sum-order rule).
- competing_risks_cif: kaplan_meier treats ONE event; when purchase
  and error compete for 'first thing a user does', 1 - KM per cause
  OVERSTATES both. The Aalen-Johansen CIF_k(t) = sum S(s-) d_k/n
  uses e9-integer log prefix sums for the survival product on the
  event-day spine -- exactly the sentinel-free batch form.
- monetary_unit_sampling: the auditor's PPS scheme -- fixed-interval
  systematic selection on the cumulative cents axis (rank-operator
  prefix sums), so every dollar has equal selection probability and
  any order bigger than the interval is selected with certainty.
  Entirely exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_NEYMAN_BUDGET = 1000
_MUS_POINTS = 100
_CIF_DAYS = (1, 3, 7, 14, 30)


# ---------------------------------------------------------------------------
# Neyman allocation of a 1000-order sampling budget across nations.
# ---------------------------------------------------------------------------
@register(
    "neyman_allocation",
    f"""
    WITH vals AS (
      SELECT c.c_nationkey AS g,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) // 100 AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    gs AS (
      SELECT g, CAST(count(*) AS BIGINT) AS nh,
             CAST(sum(v) AS HUGEINT) AS s,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
      FROM vals GROUP BY g),
    w AS (
      SELECT g, nh,
             sqrt((CAST(nh AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
                  / (CAST(nh AS DOUBLE) * nh)) AS sh,
             CAST(floor(1e6 * (CAST(nh AS DOUBLE)
                   * sqrt((CAST(nh AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
                          / (CAST(nh AS DOUBLE) * nh))) + 0.5) AS BIGINT)
               AS w_e6
      FROM gs),
    tot AS (
      SELECT CAST(sum(w_e6) AS HUGEINT) AS wsum,
             CAST(sum(nh) AS BIGINT) AS n
      FROM w)
    SELECT CAST(w.g AS INTEGER) AS nationkey,
           w.nh AS stratum_orders,
           round(w.sh, 2) AS stratum_sd_dollars,
           round(CAST(w.w_e6 AS DOUBLE) / CAST(t.wsum AS DOUBLE), 6)
             AS alloc_share,
           CAST(round({_NEYMAN_BUDGET}.0 * w.w_e6 / CAST(t.wsum AS DOUBLE), 0)
                AS BIGINT) AS n_alloc
    FROM w CROSS JOIN tot t
    ORDER BY nationkey
    """,
    tags=("sampling", "design", "exact-arith"),
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a 1000-order audit budget across
    nations: n_h proportional to N_h S_h (stratum size x stratum SD,
    whole dollars), each stratum's weight e6-floored so the share
    normalization divides exact integers. Strata that are big AND
    volatile get the samples -- the design that minimizes the
    estimator variance at fixed cost, vs the proportional allocation
    stratified_sample implements."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cu = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    vals = o.join(cu, o.o_custkey == cu.c_custkey).select(
        F.col("c_nationkey").alias("g"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT) DIV 100").alias("v"),
    )
    gs = vals.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum("v").cast(_DEC).alias("s"),
        F.sum(F.col("v").cast(_DEC) * F.col("v").cast(_DEC)).cast(_DEC).alias("q"),
    )
    sh = F.sqrt(
        (
            F.col("nh").cast("double") * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (F.col("nh").cast("double") * F.col("nh"))
    )
    w = gs.select(
        "g",
        "nh",
        sh.alias("sh"),
        F.floor(F.lit(1e6) * (F.col("nh").cast("double") * sh) + 0.5)
        .cast("bigint")
        .alias("w_e6"),
    )
    tot = w.agg(
        F.sum("w_e6").cast(_DEC).alias("wsum"),
        F.sum("nh").cast("bigint").alias("n"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            F.col("g").cast("int").alias("nationkey"),
            F.col("nh").alias("stratum_orders"),
            F.round("sh", 2).alias("stratum_sd_dollars"),
            F.round(
                F.col("w_e6").cast("double") / F.col("wsum").cast("double"), 6
            ).alias("alloc_share"),
            F.round(
                F.lit(float(_NEYMAN_BUDGET))
                * F.col("w_e6")
                / F.col("wsum").cast("double"),
                0,
            )
            .cast("bigint")
            .alias("n_alloc"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Competing-risks cumulative incidence: first purchase vs first error.
# ---------------------------------------------------------------------------
@register(
    "competing_risks_cif",
    f"""
    WITH firsts AS (
      SELECT user_id,
             min(CAST(ts AS DATE)) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
               AS tp,
             min(CASE WHEN event_type = 'error' THEN CAST(ts AS DATE) END)
               AS te
      FROM events GROUP BY user_id),
    labeled AS (
      SELECT user_id,
             CASE
               WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
                 THEN date_diff('day', t0, tp)
               WHEN te IS NOT NULL THEN date_diff('day', t0, te)
             END AS t,
             CASE
               WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 'p'
               WHEN te IS NOT NULL THEN 'e'
             END AS cause
      FROM firsts),
    nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM labeled),
    spine AS (
      SELECT t, CAST(sum(CASE WHEN cause = 'p' THEN 1 ELSE 0 END) AS BIGINT)
               AS dp,
             CAST(sum(CASE WHEN cause = 'e' THEN 1 ELSE 0 END) AS BIGINT) AS de
      FROM labeled WHERE t IS NOT NULL GROUP BY t),
    pre AS (
      SELECT t, dp, de,
             coalesce(sum(dp + de) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fallen
      FROM spine),
    haz AS (
      SELECT t, dp, de, nu.n - fallen AS atrisk,
             CASE WHEN dp + de < nu.n - fallen
               THEN CAST(floor(1e9 * ln(1.0 - CAST(dp + de AS DOUBLE)
                                        / (nu.n - fallen)) - 0.5) AS BIGINT)
               ELSE CAST(-1000000000000 AS BIGINT) END AS lns_e9
      FROM pre CROSS JOIN nu),
    surv AS (
      SELECT t, dp, de, atrisk,
             coalesce(sum(lns_e9) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cuml_e9
      FROM haz),
    terms AS (
      SELECT t,
             CAST(floor(1e9 * exp(cuml_e9 / 1e9) * dp / atrisk + 0.5) AS BIGINT)
               AS cifp_e9,
             CAST(floor(1e9 * exp(cuml_e9 / 1e9) * de / atrisk + 0.5) AS BIGINT)
               AS cife_e9
      FROM surv),
    cum AS (
      SELECT t,
             sum(cifp_e9) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
             sum(cife_e9) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce
      FROM terms),
    grid AS (SELECT unnest(ARRAY{list(_CIF_DAYS)}) AS d),
    at_d AS (
      SELECT g.d,
             max(c.t) AS last_t
      FROM grid g JOIN cum c ON c.t <= g.d GROUP BY g.d)
    SELECT CAST(a.d AS INTEGER) AS day,
           round(CAST(c.cp AS DOUBLE) / 1e9, 6) AS cif_purchase,
           round(CAST(c.ce AS DOUBLE) / 1e9, 6) AS cif_error
    FROM at_d a JOIN cum c ON c.t = a.last_t
    ORDER BY day
    """,
    tags=("survival", "competing-risks", "exact-arith"),
)
def q_competing_risks_cif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence of 'first purchase' vs
    'first error' from each user's first event (ties to purchase;
    users with neither stay at risk throughout): the survival product
    S(t-) = exp(sum ln(1 - d/n)) accumulates e9-FLOORED log terms on
    the event-day spine (a full-absorption day would hit ln(0): its
    term is the -1000 sentinel, and being the LAST spine day it never
    enters any used prefix), each CIF increment S(t-) d_k/n floors to e9
    before its running sum, and the 1/3/7/14/30-day readout joins the
    constant grid to the last spine day at or before it. The curves
    that 1 - KM per cause would overstate -- the whole point of
    competing-risks analysis."""
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts").cast("date"))
        ).alias("tp"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("ts").cast("date"))
        ).alias("te"),
    )
    p_first = F.col("tp").isNotNull() & (
        F.col("te").isNull() | (F.col("tp") <= F.col("te"))
    )
    labeled = firsts.select(
        "user_id",
        F.when(p_first, F.datediff("tp", "t0"))
        .when(F.col("te").isNotNull(), F.datediff("te", "t0"))
        .alias("t"),
        F.when(p_first, F.lit("p"))
        .when(F.col("te").isNotNull(), F.lit("e"))
        .alias("cause"),
    )
    # r13: three chained rank passes + two tail joins re-ran this whole
    # lineage multiplicatively (each rank pass scans its input twice, so
    # the events groupBy ran up to 16x); pin the per-user frame once and
    # collect the single scalar n as a literal.
    labeled = labeled.localCheckpoint(eager=True)
    n_lit = labeled.agg(F.count(F.lit(1)).cast("bigint").alias("n")).first()[0]
    spine = (
        labeled.where(F.col("t").isNotNull())
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("cause") == "p", 1).otherwise(0))
            .cast("bigint")
            .alias("dp"),
            F.sum(F.when(F.col("cause") == "e", 1).otherwise(0))
            .cast("bigint")
            .alias("de"),
        )
    )
    pre = with_global_rank(
        spine.withColumn("dall", F.col("dp") + F.col("de")),
        "t",
        [F.col("t")],
        prefix_sum={"cc": "dall"},
    ).select(
        "t", "dp", "de", (F.col("cc") - F.col("dall")).alias("fallen")
    )
    haz = pre.withColumn("n", F.lit(n_lit).cast("bigint")).select(
        "t",
        "dp",
        "de",
        (F.col("n") - F.col("fallen")).alias("atrisk"),
        F.when(
            F.col("dp") + F.col("de") < F.col("n") - F.col("fallen"),
            F.floor(
                F.lit(1e9)
                * F.log(
                    1.0
                    - (F.col("dp") + F.col("de")).cast("double")
                    / (F.col("n") - F.col("fallen"))
                )
                - 0.5
            ).cast("bigint"),
        )
        .otherwise(F.lit(-1000000000000).cast("bigint"))
        .alias("lns_e9"),
    )
    surv = with_global_rank(
        haz, "t", [F.col("t")], prefix_sum={"lcum": "lns_e9"}
    ).select(
        "t",
        "dp",
        "de",
        "atrisk",
        (F.col("lcum") - F.col("lns_e9")).alias("cuml_e9"),
    )
    terms = surv.select(
        "t",
        F.floor(
            F.lit(1e9)
            * F.exp(F.col("cuml_e9") / 1e9)
            * F.col("dp")
            / F.col("atrisk")
            + 0.5
        )
        .cast("bigint")
        .alias("cifp_e9"),
        F.floor(
            F.lit(1e9)
            * F.exp(F.col("cuml_e9") / 1e9)
            * F.col("de")
            / F.col("atrisk")
            + 0.5
        )
        .cast("bigint")
        .alias("cife_e9"),
    )
    cum = with_global_rank(
        # the event-day spine is tiny (~30 rows) but its lineage holds
        # two rank passes: pin before the doubled tail joins
        terms.localCheckpoint(eager=True),
        "t",
        [F.col("t")],
        prefix_sum={"cp": "cifp_e9", "ce": "cife_e9"},
    ).select("t", "cp", "ce").localCheckpoint(eager=True)
    grid = spark.createDataFrame([(d,) for d in _CIF_DAYS], "d int")
    at_d = (
        grid.join(F.broadcast(cum), F.col("t") <= F.col("d"))
        .groupBy("d")
        .agg(F.max("t").alias("last_t"))
    )
    return (
        at_d.join(cum, at_d.last_t == cum.t)
        .select(
            F.col("d").cast("int").alias("day"),
            F.round(F.col("cp").cast("double") / 1e9, 6).alias("cif_purchase"),
            F.round(F.col("ce").cast("double") / 1e9, 6).alias("cif_error"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Monetary-unit (PPS) systematic sampling.
# ---------------------------------------------------------------------------
@register(
    "monetary_unit_sampling",
    f"""
    WITH vals AS (
      SELECT o_orderkey AS ok,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders),
    ranked AS (
      SELECT ok, v,
             sum(v) OVER (ORDER BY ok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM vals),
    tot AS (SELECT CAST(sum(v) AS HUGEINT) AS t FROM vals),
    pts AS (
      SELECT CAST(j AS BIGINT) * (SELECT CAST(t AS BIGINT) FROM tot)
               // {_MUS_POINTS} AS p
      FROM (SELECT unnest(range(1, {_MUS_POINTS + 1})) AS j)),
    hits AS (
      SELECT r.ok, r.v, CAST(count(*) AS BIGINT) AS n_points
      FROM ranked r JOIN pts ON pts.p > r.cum - r.v AND pts.p <= r.cum
      GROUP BY r.ok, r.v),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(n_points) AS BIGINT) AS n_pts,
             CAST(sum(v) AS HUGEINT) AS sel_v,
             CAST(max(v) AS BIGINT) AS max_v,
             CAST(sum(CASE WHEN n_points > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_multi
      FROM hits)
    SELECT {_MUS_POINTS} AS n_sampling_points,
           a.n_orders AS n_selected_orders,
           a.n_multi AS n_certainty_multihit,
           round(CAST(a.sel_v AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
             AS value_coverage,
           round(a.max_v / 100.0, 2) AS largest_selected_dollars
    FROM agg a CROSS JOIN tot t
    """,
    tags=("audit", "sampling", "exact-arith"),
)
def q_monetary_unit_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-unit sampling: 100 systematic points on the cumulative
    cents axis (book order = orderkey; prefix sums off the rank
    operator; interval = total DIV 100), an order is selected iff a
    point lands in its cents range -- so selection probability is
    proportional to value and any order over one interval is a
    CERTAINTY selection (n_points > 1 marks them). The PPS scheme
    audit standards prescribe, in exact integer arithmetic end to
    end."""
    orders = read_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.col("o_orderkey").alias("ok"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
    )
    ranked = with_global_rank(
        vals, "ok", [F.col("ok")], prefix_sum={"cum": "v"}
    ).select("ok", "v", "cum")
    tot = vals.agg(F.sum("v").cast("bigint").alias("t"))
    pts = (
        spark.range(1, _MUS_POINTS + 1)
        .select(F.col("id").alias("j"))
        .crossJoin(F.broadcast(tot))
        .select(F.expr(f"j * t DIV {_MUS_POINTS}").alias("p"))
    )
    hits = (
        ranked.join(
            F.broadcast(pts),
            (F.col("p") > F.col("cum") - F.col("v")) & (F.col("p") <= F.col("cum")),
        )
        .groupBy("ok", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    )
    agg = hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("n_points").cast("bigint").alias("n_pts"),
        F.sum("v").cast(_DEC).alias("sel_v"),
        F.max("v").cast("bigint").alias("max_v"),
        F.sum(F.when(F.col("n_points") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_multi"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        F.lit(_MUS_POINTS).alias("n_sampling_points"),
        F.col("n_orders").alias("n_selected_orders"),
        F.col("n_multi").alias("n_certainty_multihit"),
        F.round(
            F.col("sel_v").cast("double") / F.col("t").cast("double"), 6
        ).alias("value_coverage"),
        F.round(F.col("max_v") / 100.0, 2).alias("largest_selected_dollars"),
    )
