"""Extension batch 176 (round 6): attribute mixing, exact dynamic lot
sizing, and the Nigrini primary test -- brand assortativity of the
copurchase graph (Newman's attribute mixing coefficient: do orders
combine same-brand parts more than chance? the categorical companion
of degree_assortativity), Wagner-Whitin dynamic lot sizing solved
EXACTLY as a shortest path on the month DAG via min-plus squarings
(the optimal-batching DP that eoq_reorder_policy's continuous formula
approximates -- nodes are months, an edge j-1 -> t is 'one setup at j
covers demand through t', 7 squarings close the 85-node DAG), and
the first-two-digit Benford test (the 90-cell screen Nigrini
recommends as the PRIMARY audit test -- finer than first-digit,
stabler than second).

Cross-engine discipline:
- Assortativity: the mixing matrix folds exact integer co-occurrence
  counts; r = (tr E - sum a_i b_i)/(1 - sum a_i b_i) evaluates from
  e12-quantized marginal products.
- Wagner-Whitin: demands, prefix sums, edge costs and every min-plus
  relaxation are pure integers -- the optimum is exact, and the
  lot-for-lot / single-batch baselines print beside it.
- F2D: digits from the string render; expected probabilities are 90
  shared Python literals; chi-square terms e9-quantize.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_N_SQ = 7  # 2^7 = 128 > 85 month nodes
_K_MULT = 10  # setup cost = 10 * mu units of holding
_P_F2D = tuple(math.log10(1.0 + 1.0 / d) for d in range(10, 100))
_CHI2_CRIT_89DF = 112.02198574980785  # 95th pct, 89 df


@register(
    "brand_assortativity_copurchase",
    """
    WITH li AS (
      SELECT l.l_orderkey AS ok, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    pairs AS (
      SELECT a.b AS ba, c.b AS bb
      FROM li a JOIN li c ON a.ok = c.ok AND a.b < c.b),
    edges AS (
      SELECT ba, bb, CAST(count(*) AS BIGINT) AS w FROM pairs GROUP BY ba, bb),
    diag AS (
      SELECT b AS ba, CAST(sum(k * (k - 1) // 2) AS BIGINT) AS w
      FROM (SELECT ok, b, CAST(count(*) AS BIGINT) AS k
            FROM li GROUP BY ok, b) kk
      GROUP BY b
      HAVING sum(k * (k - 1) // 2) > 0),
    alledges AS (
      SELECT ba, bb, w FROM edges
      UNION ALL SELECT ba, ba AS bb, w FROM diag),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM alledges),
    marg AS (
      SELECT side.b AS b, CAST(sum(side.w) AS BIGINT) AS dw
      FROM (SELECT ba AS b, w FROM alledges
            UNION ALL SELECT bb AS b, w FROM alledges) side
      GROUP BY side.b),
    terms AS (
      SELECT CAST(sum(CASE WHEN e.ba = e.bb THEN 2 * e.w ELSE 0 END)
                  AS BIGINT) AS tr2,
             max(t.m) AS m
      FROM alledges e CROSS JOIN tot t),
    ab AS (
      SELECT CAST(sum(CAST(floor(
               (CAST(mg.dw AS DOUBLE) / (2.0 * t.m))
               * (CAST(mg.dw AS DOUBLE) / (2.0 * t.m)) * 1e12 + 0.5)
               AS BIGINT)) AS HUGEINT) AS sab_e12
      FROM marg mg CROSS JOIN tot t)
    SELECT t2.m AS n_edges,
           round(CAST(t2.tr2 AS DOUBLE) / (2.0 * t2.m), 6) AS same_brand_share,
           round(CAST(a2.sab_e12 AS DOUBLE) / 1e12, 6) AS expected_share,
           round((CAST(t2.tr2 AS DOUBLE) / (2.0 * t2.m)
                  - CAST(a2.sab_e12 AS DOUBLE) / 1e12)
                 / (1.0 - CAST(a2.sab_e12 AS DOUBLE) / 1e12), 6) + 0.0
             AS assortativity_r
    FROM terms t2 CROSS JOIN ab a2
    """,
    tags=("graph", "mixing", "assortativity"),
)
def q_brand_assortativity_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Newman attribute assortativity by part brand on the copurchase
    graph (line pairs within an order are edges): r = (observed
    same-brand edge share - random-mixing expectation sum a_i^2) /
    (1 - expectation). r > 0 means baskets concentrate within brands,
    r < 0 means brands mix MORE than chance (cross-brand baskets).
    Edge tallies are exact integers (same-brand pair counts from the
    C(k,2) identity); marginal products e12-quantize before the
    expectation sum. One order-keyed self-join, the copurchase
    shuffle the modularity query already pays."""
    li = read_table(spark, sf_dir, "lineitem").join(
        read_table(spark, sf_dir, "part"),
        F.col("p_partkey") == F.col("l_partkey"),
    ).select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
    a = li.alias("a")
    c = li.alias("c")
    pairs = a.join(
        c,
        (F.col("a.ok") == F.col("c.ok")) & (F.col("a.b") < F.col("c.b")),
    ).select(F.col("a.b").alias("ba"), F.col("c.b").alias("bb"))
    edges = pairs.groupBy("ba", "bb").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    # same-brand pairs within an order: C(k,2) per (order, brand)
    diag = (
        li.groupBy("ok", "b")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy(F.col("b").alias("ba"))
        .agg(
            F.sum(F.expr("CAST(k * (k - 1) DIV 2 AS BIGINT)"))
            .cast("bigint")
            .alias("w")
        )
        .where(F.col("w") > 0)
        .select("ba", F.col("ba").alias("bb"), "w")
    )
    alledges = edges.unionByName(diag)
    tot = alledges.agg(F.sum("w").cast("bigint").alias("m"))
    marg = (
        alledges.select(F.col("ba").alias("b"), "w")
        .unionByName(alledges.select(F.col("bb").alias("b"), "w"))
        .groupBy("b")
        .agg(F.sum("w").cast("bigint").alias("dw"))
    )
    terms = alledges.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.when(F.col("ba") == F.col("bb"), 2 * F.col("w")).otherwise(0)
        )
        .cast("bigint")
        .alias("tr2"),
        F.max("m").alias("m"),
    )
    share = F.col("dw").cast("double") / (2.0 * F.col("m"))
    ab = marg.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.floor(share * share * 1e12 + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("sab_e12")
    )
    obs = F.col("tr2").cast("double") / (2.0 * F.col("m"))
    exp_ = F.col("sab_e12").cast("double") / 1e12
    return terms.crossJoin(F.broadcast(ab)).select(
        F.col("m").alias("n_edges"),
        F.round(obs, 6).alias("same_brand_share"),
        F.round(exp_, 6).alias("expected_share"),
        (F.round((obs - exp_) / (1.0 - exp_), 6) + F.lit(0.0)).alias(
            "assortativity_r"
        ),
    )


def _ww_minplus_sql() -> str:
    blocks = []
    for k in range(1, _N_SQ + 1):
        blocks.append(f"""
    d{k} AS MATERIALIZED (
      SELECT a.src, b.dst, min(a.w + b.w) AS w
      FROM d{k - 1} a JOIN d{k - 1} b ON b.src = a.dst
      GROUP BY a.src, b.dst)""")
    return ",".join(blocks)


@register(
    "wagner_whitin_lotsize",
    f"""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(count(*) AS BIGINT) AS dem
      FROM orders GROUP BY date_trunc('month', o_orderdate)),
    sp AS (
      SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, dem,
             CAST(sum(dem) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS p1,
             CAST(sum(dem * row_number_col) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS pi
      FROM (SELECT m, dem,
                   CAST(row_number() OVER (ORDER BY m) AS BIGINT)
                     AS row_number_col
            FROM monthly) x),
    par AS (
      SELECT CAST(max(t) AS BIGINT) AS tt,
             CAST((max(p1) + max(t) - 1) // max(t) AS BIGINT) AS mu
      FROM sp),
    spz AS (
      SELECT t, p1, pi FROM sp
      UNION ALL SELECT 0, 0, 0),
    d0 AS MATERIALIZED (
      -- edge (j-1) -> t: setup at j covering j..t; holding cost
      -- h * sum (i - j) d_i with h = 1, plus K = 10 mu
      SELECT a.t AS src, b.t AS dst,
             CAST({_K_MULT} * p.mu
                  + (b.pi - a.pi) - (a.t + 1) * (b.p1 - a.p1) AS BIGINT)
               AS w
      FROM spz a JOIN spz b ON b.t > a.t
      CROSS JOIN par p
      UNION ALL
      SELECT t, t, CAST(0 AS BIGINT) FROM spz),
    {_ww_minplus_sql()},
    best AS (
      SELECT min(w) AS opt
      FROM d{_N_SQ} d CROSS JOIN par p
      WHERE d.src = 0 AND d.dst = p.tt),
    lots AS (
      SELECT CAST(p.tt * {_K_MULT} * p.mu AS BIGINT) AS lot_for_lot,
             (SELECT w FROM d0 e, par p2
              WHERE e.src = 0 AND e.dst = p2.tt AND e.src <> e.dst)
               AS single_batch
      FROM par p)
    SELECT p3.tt AS n_months, p3.mu AS mu_monthly_demand,
           CAST({_K_MULT} * p3.mu AS BIGINT) AS setup_cost,
           CAST(b2.opt AS BIGINT) AS optimal_cost,
           CAST(l2.lot_for_lot AS BIGINT) AS lot_for_lot_cost,
           CAST(l2.single_batch AS BIGINT) AS single_batch_cost,
           round(CAST(b2.opt AS DOUBLE) / l2.lot_for_lot, 6)
             AS optimal_vs_lot_for_lot
    FROM par p3 CROSS JOIN best b2 CROSS JOIN lots l2
    """,
    tags=("operations", "inventory", "dp"),
)
def q_wagner_whitin_lotsize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Wagner-Whitin dynamic lot sizing over the monthly demand
    history (setup K = 10 mu, holding h = 1 per unit-month): node t
    is 'demand through month t is covered'; edge (j-1) -> t costs one
    setup plus the holding of serving months j..t from a single batch
    (closed form from the exact prefix sums P1, Pi). Seven min-plus
    squarings close the 85-node DAG and dist(0 -> T) is the optimal
    plan cost -- the DP optimum eoq_reorder_policy's continuous
    square-root formula only approximates. Lot-for-lot and
    single-batch baselines print beside it; every number is an exact
    integer.

    Scale split (r8, the spectral/IVF-quantizer precedent): the
    data-dependent work -- aggregating orders into the monthly demand
    series -- runs distributed; the DP state is a BOUNDED <=1-row-per-
    month prefix table (~86 rows for this 7-year warehouse, day-capped
    like the CALENDAR window class), so it is collected once and the
    exact-integer shortest-path DP runs in Python (identical optimum
    to the oracle's min-plus closure: both are dist(0 -> T) on the
    same DAG with the same integer weights). The r7 plan ran 7
    min-plus squarings as Spark self-joins over the 3.7k-edge matrix
    -- 7 shuffle rounds of fixed overhead (~50-97 s at sf0.01) for a
    driver-sized problem; this fold cuts it to one job."""
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("dem"))
    w = Window.orderBy("m")
    base = monthly.select(
        "m", F.row_number().over(w).cast("bigint").alias("t"), "dem"
    )
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    sp = base.select(
        "t",
        "dem",
        F.sum("dem").over(wt).cast("bigint").alias("p1"),
        F.sum(F.col("dem") * F.col("t")).over(wt).cast("bigint").alias("pi"),
    )
    # Bounded collect (one row per month, ~86): DP state is O(months).
    rows = sorted(
        (
            (r["t"], r["p1"], r["pi"])
            for r in collect_nonempty(sp, "wagner_whitin monthly demand")
        ),
        key=lambda x: x[0],
    )
    tt = rows[-1][0]
    mu = (rows[-1][1] + tt - 1) // tt
    p1 = {0: 0}
    pi = {0: 0}
    for t, rp1, rpi in rows:
        p1[t], pi[t] = rp1, rpi

    def _edge(src: int, dst: int) -> int:
        # setup at src+1 covering src+1..dst; exact integer closed form
        return (
            _K_MULT * mu
            + (pi[dst] - pi[src])
            - (src + 1) * (p1[dst] - p1[src])
        )

    # Shortest path 0 -> tt on the DAG == the oracle's min-plus closure
    # dist; both exact integers.
    dist = {0: 0}
    for t in range(1, tt + 1):
        dist[t] = min(dist[s] + _edge(s, t) for s in range(t))
    opt, single_batch = dist[tt], _edge(0, tt)
    scalars = spark.createDataFrame(
        [(tt, mu, opt, single_batch)],
        "tt LONG, mu LONG, opt LONG, single_batch LONG",
    )
    return (
        scalars.select(
            F.col("tt").alias("n_months"),
            F.col("mu").alias("mu_monthly_demand"),
            (_K_MULT * F.col("mu")).cast("bigint").alias("setup_cost"),
            F.col("opt").cast("bigint").alias("optimal_cost"),
            (F.col("tt") * _K_MULT * F.col("mu"))
            .cast("bigint")
            .alias("lot_for_lot_cost"),
            F.col("single_batch").cast("bigint").alias("single_batch_cost"),
            F.round(
                F.col("opt").cast("double")
                / (F.col("tt") * _K_MULT * F.col("mu")),
                6,
            ).alias("optimal_vs_lot_for_lot"),
        )
    )


@register(
    "benford_first_two_digits",
    f"""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders),
    digits AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 2) AS INTEGER) AS d2
      FROM v WHERE cents >= 10),
    counts AS (
      SELECT d2, CAST(count(*) AS BIGINT) AS n_obs FROM digits GROUP BY d2),
    grid AS (
      SELECT unnest(range(10, 100)) AS d2,
             unnest([{', '.join(repr(p) for p in _P_F2D)}]) AS p_exp),
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
             CAST(sum(dev_e12) AS HUGEINT) AS mad90_e12
      FROM terms),
    worst AS (
      SELECT d2 AS worst_cell,
             CAST(floor(CAST(n_obs AS DOUBLE) / n * 1e12 + 0.5) AS BIGINT)
               - CAST(floor(p_exp * 1e12 + 0.5) AS BIGINT) AS dev
      FROM terms ORDER BY chi_e9 DESC, d2 LIMIT 1)
    SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_values,
           round(CAST(s.chi2_e9 AS DOUBLE) / 1e9, 4) AS chi2,
           round(CAST(s.mad90_e12 AS DOUBLE) / 1e12 / 90.0, 6) AS mad,
           CAST(s.chi2_e9 AS DOUBLE) / 1e9 > {_CHI2_CRIT_89DF!r}
             AS reject_5pct,
           w.worst_cell,
           round(CAST(w.dev AS DOUBLE) / 1e12, 6) + 0.0 AS worst_cell_excess
    FROM sums s CROSS JOIN worst w
    """,
    tags=("fraud", "benford", "audit"),
)
def q_benford_first_two_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nigrini's first-two-digit test -- the PRIMARY audit screen his
    methodology recommends (finer than first-digit: a spike at one
    specific 2-digit cell, say 48 or 99, is the classic just-under-
    threshold signature the coarse tests smear out): the 90-cell
    profile against P(d) = log10(1 + 1/d), d = 10..99, summarized by
    chi-square (89 df critical literal), MAD, and the single WORST
    cell with its excess share. Digits from the string render;
    chi/dev terms e9/e12-quantize before their sums."""
    orders = read_table(spark, sf_dir, "orders")
    v = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents")
    )
    digits = v.where(F.col("cents") >= 10).select(
        F.substring(F.col("cents").cast("string"), 1, 2)
        .cast("integer")
        .alias("d2")
    )
    counts = digits.groupBy("d2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    grid = spark.createDataFrame(
        [(d, p) for d, p in zip(range(10, 100), _P_F2D)],
        "d2 INT, p_exp DOUBLE",
    )
    filled = grid.join(counts, "d2", "left").select(
        "d2", "p_exp", F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs")
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
        F.sum("dev_e12").cast(_DEC).alias("mad90_e12"),
    )
    worst = (
        terms.orderBy(F.col("chi_e9").desc(), "d2")
        .limit(1)
        .select(
            F.col("d2").alias("worst_cell"),
            (
                F.floor(nd / F.col("n") * 1e12 + 0.5).cast("bigint")
                - F.floor(F.col("p_exp") * 1e12 + 0.5).cast("bigint")
            ).alias("dev"),
        )
    )
    return (
        sums.crossJoin(F.broadcast(worst))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_values"),
            F.round(F.col("chi2_e9").cast("double") / 1e9, 4).alias("chi2"),
            F.round(
                F.col("mad90_e12").cast("double") / 1e12 / 90.0, 6
            ).alias("mad"),
            (
                F.col("chi2_e9").cast("double") / 1e9 > _CHI2_CRIT_89DF
            ).alias("reject_5pct"),
            "worst_cell",
            (
                F.round(F.col("dev").cast("double") / 1e12, 6) + F.lit(0.0)
            ).alias("worst_cell_excess"),
        )
    )
