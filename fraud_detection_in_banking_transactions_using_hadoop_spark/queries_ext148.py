"""Extension batch 148 (round 6): two-component Gaussian mixture EM
fitted IN-ENGINE over the order-amount spine (the classic
"legitimate vs inflated amounts" latent-class model; completes the
ML-fitting tier beside kmeans_1d_lloyd -- hard assignments -- and the
GLM Newton folds), and Fisher's EXACT test on a 2x2 with a
by-construction bounded margin (top-20 spenders x has-return), the
small-sample answer to chi2_independence's asymptotics.

Cross-engine discipline:
- EM: every M-step sufficient statistic is quantized per spine row
  (responsibility mass e6, value sums e2 in whole dollars, square
  sums e0) and summed as DECIMAL(38,0)/HUGEINT, so the 3 iteration
  states are identical doubles; underflowed responsibilities (both
  densities -> 0 far in the tails) fall back to the deterministic
  nearer-component rule in BOTH engines.
- Fisher: ln-factorials are a SHARED generated CASE -- exact
  math.lgamma literals for n <= 30, 2-term Stirling above (|err| <
  1e-11) -- and the <= 21 hypergeometric terms (margin capped at 20 by
  construction) are e15-quantized before the two-sided sum.

Scale notes: EM iterates over the localCheckpointed (v, c) spine
(EAGER class, the huber/GLM shape -- one small aggregate per round);
Fisher is two aggregates plus a 21-row support grid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_EM_ROUNDS = 3
_TOP_N = 20


# --------------------------------------------------------------------------
# shared ln-factorial text: exact lgamma literals to 30, Stirling above
# --------------------------------------------------------------------------
def _lnfact_sql(x: str) -> str:
    cases = " ".join(
        f"WHEN {k} THEN {math.lgamma(k + 1)!r}" for k in range(31)
    )
    n = f"CAST({x} AS DOUBLE)"
    stirling = (
        f"({n} * ln({n}) - {n} + 0.5 * ln(2.0 * pi() * {n})"
        f" + 1.0 / (12.0 * {n}) - 1.0 / (360.0 * {n} * {n} * {n}))"
    )
    return f"(CASE WHEN ({x}) <= 30 THEN (CASE ({x}) {cases} END) ELSE {stirling} END)"


def _gmm_phi(v: str, mu: str, sg2: str) -> str:
    """Full normal pdf text over double fragments."""
    return (
        f"(exp(-(({v}) - ({mu})) * (({v}) - ({mu})) / (2.0 * ({sg2})))"
        f" / sqrt(2.0 * pi() * ({sg2})))"
    )


def _gmm_round_sql(i: int) -> str:
    v = "CAST(s.v AS DOUBLE)"
    c = "CAST(s.c AS DOUBLE)"
    phi0 = _gmm_phi(v, "p.mu0", "p.sg0")
    phi1 = _gmm_phi(v, "p.mu1", "p.sg1")
    den = f"((1.0 - p.w1) * {phi0} + p.w1 * {phi1})"
    near1 = (
        f"(CASE WHEN (({v}) - p.mu0) * (({v}) - p.mu0) / p.sg0"
        f" > (({v}) - p.mu1) * (({v}) - p.mu1) / p.sg1 THEN 1.0 ELSE 0.0 END)"
    )
    r1 = f"(CASE WHEN {den} > 0.0 THEN p.w1 * {phi1} / {den} ELSE {near1} END)"
    return f"""
    gstat{i} AS (
      SELECT
        CAST(sum(CAST(floor({c} * {r1} * 1e6 + 0.5) AS BIGINT)) AS HUGEINT)
          AS n1_e6,
        CAST(sum(CAST(floor({c} * {r1} * {v} * 1e2 + 0.5) AS BIGINT))
          AS HUGEINT) AS s1_e2,
        CAST(sum(CAST(floor({c} * {r1} * {v} * {v} + 0.5) AS BIGINT))
          AS HUGEINT) AS q1_e0,
        CAST(sum(CAST(floor({c} * (1.0 - {r1}) * 1e6 + 0.5) AS BIGINT))
          AS HUGEINT) AS n0_e6,
        CAST(sum(CAST(floor({c} * (1.0 - {r1}) * {v} * 1e2 + 0.5) AS BIGINT))
          AS HUGEINT) AS s0_e2,
        CAST(sum(CAST(floor({c} * (1.0 - {r1}) * {v} * {v} + 0.5) AS BIGINT))
          AS HUGEINT) AS q0_e0
      FROM gspine s CROSS JOIN gp{i} p),
    gp{i + 1} AS (
      SELECT
        CAST(n1_e6 AS DOUBLE) / (CAST(n0_e6 AS DOUBLE) + n1_e6) AS w1,
        (CAST(s0_e2 AS DOUBLE) / 1e2) / (CAST(n0_e6 AS DOUBLE) / 1e6) AS mu0,
        (CAST(s1_e2 AS DOUBLE) / 1e2) / (CAST(n1_e6 AS DOUBLE) / 1e6) AS mu1,
        greatest(CAST(q0_e0 AS DOUBLE) / (CAST(n0_e6 AS DOUBLE) / 1e6)
          - ((CAST(s0_e2 AS DOUBLE) / 1e2) / (CAST(n0_e6 AS DOUBLE) / 1e6))
          * ((CAST(s0_e2 AS DOUBLE) / 1e2) / (CAST(n0_e6 AS DOUBLE) / 1e6)),
          1.0) AS sg0,
        greatest(CAST(q1_e0 AS DOUBLE) / (CAST(n1_e6 AS DOUBLE) / 1e6)
          - ((CAST(s1_e2 AS DOUBLE) / 1e2) / (CAST(n1_e6 AS DOUBLE) / 1e6))
          * ((CAST(s1_e2 AS DOUBLE) / 1e2) / (CAST(n1_e6 AS DOUBLE) / 1e6)),
          1.0) AS sg1
      FROM gstat{i})
    """


_GMM_SQL = f"""
    WITH gspine AS MATERIALIZED (
      SELECT CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100
                  AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1),
    mom AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n,
             CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS sx,
             CAST(sum(CAST(v AS HUGEINT) * v * c) AS HUGEINT) AS sxx
      FROM gspine),
    med AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n,
             min(CASE WHEN 4 * cc >= n_all THEN v END) AS q25,
             min(CASE WHEN 4 * cc >= 3 * n_all THEN v END) AS q75
      FROM (SELECT v, c, sum(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
              sum(c) OVER () AS n_all
            FROM gspine)),
    gp0 AS (
      SELECT 0.5 AS w1,
             CAST(m.q25 AS DOUBLE) AS mu0,
             CAST(m.q75 AS DOUBLE) AS mu1,
             greatest(CAST(t.n * t.sxx - t.sx * t.sx AS DOUBLE)
               / CAST(t.n AS DOUBLE) / CAST(t.n AS DOUBLE) / 4.0, 1.0) AS sg0,
             greatest(CAST(t.n * t.sxx - t.sx * t.sx AS DOUBLE)
               / CAST(t.n AS DOUBLE) / CAST(t.n AS DOUBLE) / 4.0, 1.0) AS sg1
      FROM med m CROSS JOIN mom t),
    {",".join(_gmm_round_sql(i).strip() for i in range(_EM_ROUNDS))}
    SELECT
      round(1.0 - p.w1, 6) AS weight_low,
      round(p.w1, 6) AS weight_high,
      round(p.mu0, 2) AS mu_low_dollars,
      round(p.mu1, 2) AS mu_high_dollars,
      round(sqrt(p.sg0), 2) AS sigma_low_dollars,
      round(sqrt(p.sg1), 2) AS sigma_high_dollars
    FROM gp{_EM_ROUNDS} p
    """


@register(
    "gmm_em_2comp",
    _GMM_SQL,
    tags=("ml", "mixture", "em"),
)
def q_gmm_em_2comp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian mixture over whole-dollar order
    totals, fitted by 3 EM rounds on the weighted value spine: init at
    the exact Q25/Q75 order statistics with pooled variance/4, E-step
    responsibilities from full normal pdfs (underflow falls back to
    the nearer component deterministically), M-step moments quantized
    per row (e6/e2/e0) so every iteration state is bit-identical
    across engines. The soft-assignment counterpart of
    kmeans_1d_lloyd; variance floors at $1 to keep EM from collapsing
    onto a point mass."""
    orders = read_table(spark, sf_dir, "orders")
    spine = (
        orders.select(
            F.expr(
                "CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)"
                " DIV 100 AS BIGINT)"
            ).alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    mom = spine.agg(
        F.sum("c").cast(_DEC).alias("n"),
        F.sum(F.col("v").cast(_DEC) * F.col("c")).cast(_DEC).alias("sx"),
        F.sum(F.col("v").cast(_DEC) * F.col("v") * F.col("c"))
        .cast(_DEC)
        .alias("sxx"),
    ).localCheckpoint(eager=True)
    from pyspark.sql import Window

    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    pre = spine.select(
        "v",
        "c",
        F.sum("c").over(wv).alias("cc"),
        F.sum("c").over(Window.partitionBy()).alias("n_all"),
    )
    med = pre.agg(
        F.min(F.when(4 * F.col("cc") >= F.col("n_all"), F.col("v"))).alias(
            "q25"
        ),
        F.min(
            F.when(4 * F.col("cc") >= 3 * F.col("n_all"), F.col("v"))
        ).alias("q75"),
    ).localCheckpoint(eager=True)
    var4 = F.greatest(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        / F.col("n").cast("double")
        / F.col("n").cast("double")
        / 4.0,
        F.lit(1.0),
    )
    p = (
        med.crossJoin(F.broadcast(mom))
        .select(
            F.lit(0.5).alias("w1"),
            F.col("q25").cast("double").alias("mu0"),
            F.col("q75").cast("double").alias("mu1"),
            var4.alias("sg0"),
            var4.alias("sg1"),
        )
        .localCheckpoint(eager=True)
    )

    def phi(v, mu, sg2):
        return F.exp(-(v - mu) * (v - mu) / (2.0 * sg2)) / F.sqrt(
            2.0 * math.pi * sg2
        )

    for _ in range(_EM_ROUNDS):
        j = spine.crossJoin(F.broadcast(p))
        v = F.col("v").cast("double")
        c = F.col("c").cast("double")
        p0 = phi(v, F.col("mu0"), F.col("sg0"))
        p1 = phi(v, F.col("mu1"), F.col("sg1"))
        den = (1.0 - F.col("w1")) * p0 + F.col("w1") * p1
        near1 = F.when(
            (v - F.col("mu0")) * (v - F.col("mu0")) / F.col("sg0")
            > (v - F.col("mu1")) * (v - F.col("mu1")) / F.col("sg1"),
            1.0,
        ).otherwise(0.0)
        r1 = F.when(den > 0.0, F.col("w1") * p1 / den).otherwise(near1)
        # materialize the responsibility ONCE per row: inlining r1 into
        # all six aggregate terms sextuples the expression tree and the
        # whole-stage-codegen compile time (measured 42 s -> ~8 s)
        j2 = j.select(v.alias("vd"), c.alias("cd"), r1.alias("r1"))
        vd, cd, rr = F.col("vd"), F.col("cd"), F.col("r1")
        stat = j2.agg(
            F.sum(F.floor(cd * rr * 1e6 + 0.5).cast("bigint")).cast(_DEC).alias("n1_e6"),
            F.sum(F.floor(cd * rr * vd * 1e2 + 0.5).cast("bigint"))
            .cast(_DEC)
            .alias("s1_e2"),
            F.sum(F.floor(cd * rr * vd * vd + 0.5).cast("bigint"))
            .cast(_DEC)
            .alias("q1_e0"),
            F.sum(F.floor(cd * (1.0 - rr) * 1e6 + 0.5).cast("bigint"))
            .cast(_DEC)
            .alias("n0_e6"),
            F.sum(F.floor(cd * (1.0 - rr) * vd * 1e2 + 0.5).cast("bigint"))
            .cast(_DEC)
            .alias("s0_e2"),
            F.sum(F.floor(cd * (1.0 - rr) * vd * vd + 0.5).cast("bigint"))
            .cast(_DEC)
            .alias("q0_e0"),
        )
        n0 = F.col("n0_e6").cast("double") / 1e6
        n1 = F.col("n1_e6").cast("double") / 1e6
        mu0 = (F.col("s0_e2").cast("double") / 1e2) / n0
        mu1 = (F.col("s1_e2").cast("double") / 1e2) / n1
        p = stat.select(
            (F.col("n1_e6").cast("double") / (F.col("n0_e6").cast("double") + F.col("n1_e6"))).alias("w1"),
            mu0.alias("mu0"),
            mu1.alias("mu1"),
            F.greatest(
                F.col("q0_e0").cast("double") / n0 - mu0 * mu0, F.lit(1.0)
            ).alias("sg0"),
            F.greatest(
                F.col("q1_e0").cast("double") / n1 - mu1 * mu1, F.lit(1.0)
            ).alias("sg1"),
        ).localCheckpoint(eager=True)

    return p.select(
        F.round(1.0 - F.col("w1"), 6).alias("weight_low"),
        F.round(F.col("w1"), 6).alias("weight_high"),
        F.round(F.col("mu0"), 2).alias("mu_low_dollars"),
        F.round(F.col("mu1"), 2).alias("mu_high_dollars"),
        F.round(F.sqrt(F.col("sg0")), 2).alias("sigma_low_dollars"),
        F.round(F.sqrt(F.col("sg1")), 2).alias("sigma_high_dollars"),
    )


_LNF = _lnfact_sql


def _lnchoose(n: str, k: str) -> str:
    return f"({_LNF(n)} - {_LNF(k)} - {_LNF(f'({n}) - ({k})')})"


_FISHER_SQL = f"""
    WITH spend AS (
      SELECT o_custkey AS cust,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS HUGEINT)
               AS cents
      FROM orders GROUP BY o_custkey),
    topc AS (
      SELECT cust, 1 AS is_top FROM spend
      ORDER BY cents DESC, cust LIMIT {_TOP_N}),
    ret AS (
      SELECT l.l_orderkey, o.o_custkey AS cust
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'),
    flags AS (
      SELECT s.cust,
             coalesce(t.is_top, 0) AS is_top,
             CASE WHEN r.cust IS NOT NULL THEN 1 ELSE 0 END AS has_ret
      FROM spend s
      LEFT JOIN topc t ON t.cust = s.cust
      LEFT JOIN (SELECT DISTINCT cust FROM ret) r ON r.cust = s.cust),
    tab AS (
      SELECT CAST(count(*) AS BIGINT) AS nn,
             CAST(sum(has_ret) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN is_top = 1 THEN has_ret END) AS BIGINT) AS a
      FROM flags),
    supp AS (
      SELECT t.nn, t.c1, t.a, g.k
      FROM tab t, (SELECT unnest(range(0, {_TOP_N + 1})) AS k) g
      WHERE g.k >= greatest(0, {_TOP_N} + t.c1 - t.nn)
        AND g.k <= least({_TOP_N}, t.c1)),
    pk AS (
      SELECT nn, c1, a, k,
             CAST(floor(exp(
               {_lnchoose("c1", "k")}
               + {_lnchoose(f"(nn - c1)", f"({_TOP_N} - k)")}
               - {_lnchoose("nn", str(_TOP_N))}) * 1e15 + 0.5) AS BIGINT)
               AS p_e15
      FROM supp),
    obs AS (SELECT p_e15 AS p_obs FROM pk WHERE k = a)
    SELECT p.nn AS n_customers, p.c1 AS n_with_return,
           max(CASE WHEN p.k = p.a THEN p.k END) AS top20_with_return,
           round(CAST(max(CASE WHEN p.k = p.a THEN p.p_e15 END) AS DOUBLE)
                 / 1e15, 6) AS p_observed_table,
           round(CAST(sum(CASE WHEN p.p_e15 <= o.p_obs THEN p.p_e15 END)
                 AS DOUBLE) / 1e15, 6) AS p_two_sided
    FROM pk p CROSS JOIN obs o
    GROUP BY p.nn, p.c1
    """


@register(
    "fisher_exact_2x2",
    _FISHER_SQL,
    tags=("stats", "exact-test", "fraud"),
)
def q_fisher_exact_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's EXACT test: do the top-20 spenders have returned items
    at a different rate than everyone else? The 2x2 margin is capped
    at 20 BY CONSTRUCTION, so the hypergeometric support has <= 21
    terms: each P(k) = C(c1,k)C(N-c1,20-k)/C(N,20) evaluates through
    the shared ln-factorial CASE (exact lgamma literals to 30,
    Stirling + 1/12n - 1/360n^3 above, |err| < 1e-11), is
    e15-quantized, and the two-sided p sums the terms with P(k) <=
    P(observed) -- the standard small-p definition. chi2 would be
    meaningless at n1 = 20; this is exact."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    spend = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast(_DEC)
        .alias("cents")
    )
    topc = (
        spend.orderBy(F.col("cents").desc(), "cust")
        .limit(_TOP_N)
        .select("cust", F.lit(1).alias("is_top"))
    )
    ret = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("cust"))
        .distinct()
        .select("cust", F.lit(1).alias("has_ret"))
    )
    flags = (
        spend.select("cust")
        .join(F.broadcast(topc), "cust", "left")
        .join(ret, "cust", "left")
        .select(
            F.coalesce(F.col("is_top"), F.lit(0)).alias("is_top"),
            F.coalesce(F.col("has_ret"), F.lit(0)).alias("has_ret"),
        )
    )
    tab = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum("has_ret").cast("bigint").alias("c1"),
        F.sum(F.when(F.col("is_top") == 1, F.col("has_ret")))
        .cast("bigint")
        .alias("a"),
    ).localCheckpoint(eager=True)
    grid = spark.range(0, _TOP_N + 1).select(F.col("id").alias("k"))
    supp = (
        grid.crossJoin(F.broadcast(tab))
        .where(
            (F.col("k") >= F.greatest(F.lit(0), F.lit(_TOP_N) + F.col("c1") - F.col("nn")))
            & (F.col("k") <= F.least(F.lit(_TOP_N), F.col("c1")))
        )
    )
    p_expr = (
        f"CAST(floor(exp({_lnchoose('c1', 'k')}"
        f" + {_lnchoose('(nn - c1)', f'({_TOP_N} - k)')}"
        f" - {_lnchoose('nn', str(_TOP_N))}) * 1e15 + 0.5) AS BIGINT)"
    )
    pk = supp.select("nn", "c1", "a", "k", F.expr(p_expr).alias("p_e15"))
    obs = pk.where(F.col("k") == F.col("a")).select(
        F.col("p_e15").alias("p_obs")
    )
    return (
        pk.crossJoin(F.broadcast(obs))
        .groupBy("nn", "c1")
        .agg(
            F.max(F.when(F.col("k") == F.col("a"), F.col("k"))).alias(
                "top20_with_return"
            ),
            F.round(
                F.max(F.when(F.col("k") == F.col("a"), F.col("p_e15"))).cast(
                    "double"
                )
                / 1e15,
                6,
            ).alias("p_observed_table"),
            F.round(
                F.sum(
                    F.when(F.col("p_e15") <= F.col("p_obs"), F.col("p_e15"))
                ).cast("double")
                / 1e15,
                6,
            ).alias("p_two_sided"),
        )
        .select(
            F.col("nn").alias("n_customers"),
            F.col("c1").alias("n_with_return"),
            "top20_with_return",
            "p_observed_table",
            "p_two_sided",
        )
    )
