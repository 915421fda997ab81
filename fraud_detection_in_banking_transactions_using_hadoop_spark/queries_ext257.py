"""Extension batch 257 (round 12): conditional-volatility and directed
information-flow -- the two time-series gaps left in the registry.

- garch_11_fit: GARCH(1,1) on demeaned daily log-returns of revenue,
  fitted by EXACT GRID SEARCH with variance targeting (omega =
  (1 - alpha - beta) * var_hat, the standard practitioner
  parameterization): 12 (alpha, beta) cells with alpha + beta <= 0.95,
  each running the full sigma^2 recursion + Gaussian neg-log-likelihood
  over the ~2,400-day series; argmin LL, (alpha, beta) tiebreak. The
  mean and target variance come from e12-quantized integer sums (engine
  -order-free); the recursion itself is SEQUENTIAL double arithmetic
  mirrored op-for-op between the bounded driver fold (calendar-bounded
  collect, the binary-segmentation class) and a recursive-CTE oracle
  carrying all 12 cells' (sigma^2, LL) pivoted to columns. Every
  coefficient literal is CAST AS DOUBLE in the SQL text (the DuckDB
  decimal-literal trap).

- transfer_entropy_daily: Schreiber's transfer entropy between the
  daily view-count and purchase-count series, both binarized by their
  day-over-day DIRECTION (up vs not-up -- deterministic, no median
  ties): TE(X->Y) = sum over (y', y, x) triples of p(y',y,x) *
  ln[ p(y'|y,x) / p(y'|y) ], all probabilities exact integer counts,
  one ln per cell on an exact rational, e9-quantized per cell before
  the sum (ext236 discipline). Emitted in both directions with the
  asymmetry (net flow) -- the nonlinear completion of the Granger
  pair.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_GRID = [
    (a, b)
    for a in (0.05, 0.1, 0.15, 0.2)
    for b in (0.6, 0.7, 0.8, 0.9)
    if a + b <= 0.95
]


def garch_fold(eps, grid=_GRID):
    """Reference GARCH(1,1) grid fit mirroring the oracle recursion
    float-op-for-float-op. `eps` = demeaned log returns (t = 1..n).
    Returns (best_idx, neg_ll list, varhat). Seed sigma^2_1 = varhat;
    LL accumulates from t = 2 (conditioning on the first point)."""
    n = len(eps)
    varhat_e12 = sum(int(math.floor(e * e * 1e12 + 0.5)) for e in eps)
    varhat = (float(varhat_e12) / 1e12) / float(n)
    negll = []
    for a, b in grid:
        w = (1.0 - a - b) * varhat
        s = varhat
        ll = 0.0
        pe = eps[0]
        for t in range(1, n):
            s = w + a * (pe * pe) + b * s
            e = eps[t]
            ll = ll + (math.log(s) + (e * e) / s)
            pe = e
        negll.append(ll)
    best = min(range(len(grid)), key=lambda i: (negll[i], grid[i]))
    return best, negll, varhat


def _garch_oracle() -> str:
    k = len(_GRID)
    seed = ", ".join(
        [f"m.varhat AS s{i}" for i in range(k)]
        + [f"CAST(0 AS DOUBLE) AS l{i}" for i in range(k)]
    )
    upd = ", ".join(
        [
            f"((CAST(1 AS DOUBLE) - CAST({a!r} AS DOUBLE)"
            f" - CAST({b!r} AS DOUBLE)) * ff.varhat"
            f" + CAST({a!r} AS DOUBLE) * (ff.pe * ff.pe)"
            f" + CAST({b!r} AS DOUBLE) * ff.s{i}) AS s{i}"
            for i, (a, b) in enumerate(_GRID)
        ]
        + [
            f"(ff.l{i} + (ln((CAST(1 AS DOUBLE) - CAST({a!r} AS DOUBLE)"
            f" - CAST({b!r} AS DOUBLE)) * ff.varhat"
            f" + CAST({a!r} AS DOUBLE) * (ff.pe * ff.pe)"
            f" + CAST({b!r} AS DOUBLE) * ff.s{i})"
            f" + (ff.e * ff.e) / ((CAST(1 AS DOUBLE)"
            f" - CAST({a!r} AS DOUBLE) - CAST({b!r} AS DOUBLE)) * ff.varhat"
            f" + CAST({a!r} AS DOUBLE) * (ff.pe * ff.pe)"
            f" + CAST({b!r} AS DOUBLE) * ff.s{i}))) AS l{i}"
            for i, (a, b) in enumerate(_GRID)
        ]
    )
    carry = ", ".join(
        [f"f.s{i}" for i in range(k)] + [f"f.l{i}" for i in range(k)]
    )
    # argmin by (ll, grid order): smallest index whose ll <= all others
    best_branches = []
    for i in range(k):
        conds = " AND ".join(
            f"fin.l{i} <= fin.l{j}" for j in range(k) if j != i
        )
        best_branches.append(f"WHEN {conds} THEN {i}")
    best_case = "CASE " + " ".join(best_branches) + " END"
    pick_ll = (
        "(CASE "
        + " ".join(f"WHEN best.b = {i} THEN fin.l{i}" for i in range(k))
        + " END)"
    )
    alpha_case = (
        "(CASE "
        + " ".join(
            f"WHEN best.b = {i} THEN {int(a * 1e6)}"
            for i, (a, _) in enumerate(_GRID)
        )
        + " END)"
    )
    beta_case = (
        "(CASE "
        + " ".join(
            f"WHEN best.b = {i} THEN {int(b * 1e6)}"
            for i, (_, b) in enumerate(_GRID)
        )
        + " END)"
    )
    ab_case = (
        "(CASE "
        + " ".join(
            f"WHEN best.b = {i} THEN CAST({a!r} AS DOUBLE)"
            f" + CAST({b!r} AS DOUBLE)"
            for i, (a, b) in enumerate(_GRID)
        )
        + " END)"
    )
    return f"""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    rets AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY d) AS idx,
             ln(CAST(cents AS DOUBLE))
               - ln(CAST(lag(cents) OVER (ORDER BY d) AS DOUBLE)) AS r
      FROM daily QUALIFY lag(cents) OVER (ORDER BY d) IS NOT NULL),
    mu AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             (CAST(sum(CAST(floor(r * 1e12 + 0.5) AS HUGEINT))
                   AS DOUBLE) / 1e12) / CAST(count(*) AS DOUBLE) AS mu
      FROM rets),
    eps AS MATERIALIZED (
      SELECT rets.idx - 1 AS t, rets.r - mu.mu AS e
      FROM rets CROSS JOIN mu),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             (CAST(sum(CAST(floor(e * e * 1e12 + 0.5) AS HUGEINT))
                   AS DOUBLE) / 1e12) / CAST(count(*) AS DOUBLE)
               AS varhat
      FROM eps),
    fold AS (
      SELECT CAST(1 AS BIGINT) AS t, e1.e AS pe, m.varhat, {seed}
      FROM mom m JOIN eps e1 ON e1.t = 1
      UNION ALL
      SELECT ff.t + 1, ff.e AS pe, ff.varhat, {upd}
      FROM (
        SELECT f.t, f.pe, f.varhat, {carry}, d.e
        FROM fold f JOIN eps d ON d.t = f.t + 1) ff),
    fin AS (
      SELECT f.* FROM fold f JOIN mom m ON f.t = m.n),
    best AS (SELECT {best_case} AS b FROM fin)
    SELECT CAST({alpha_case} AS BIGINT) AS alpha_e6,
           CAST({beta_case} AS BIGINT) AS beta_e6,
           CAST(floor((CAST(1 AS DOUBLE) - {ab_case}) * m.varhat * 1e12
                      + 0.5) AS BIGINT) AS omega_e12,
           CAST(floor({ab_case} * 1e6 + 0.5) AS BIGINT)
             AS persistence_e6,
           CAST(floor(m.varhat * 1e12 + 0.5) AS BIGINT) AS varhat_e12,
           CAST(floor({pick_ll} * 1e6 + 0.5) AS BIGINT) AS neg_ll_e6,
           m.n AS n_returns
    FROM best CROSS JOIN fin CROSS JOIN mom m
    """


@register(
    "garch_11_fit",
    _garch_oracle(),
    tags=("timeseries", "volatility", "finance", "exact-arith"),
)
def q_garch_11_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GARCH(1,1) grid fit with variance targeting on daily revenue
    log-returns (module docstring): calendar-bounded driver fold
    mirroring the pivoted recursive-CTE oracle, exact-integer mean and
    target variance, argmin negative log-likelihood over 12 cells."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import (
        collect_nonempty,
    )

    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .orderBy("d")
    )
    rows = collect_nonempty(daily, "garch daily revenue")
    cents = [int(r["cents"]) for r in rows]
    rets = [
        math.log(float(cents[i])) - math.log(float(cents[i - 1]))
        for i in range(1, len(cents))
    ]
    n = len(rets)
    mu_e12 = sum(int(math.floor(r * 1e12 + 0.5)) for r in rets)
    mu = (float(mu_e12) / 1e12) / float(n)
    eps = [r - mu for r in rets]
    best, negll, varhat = garch_fold(eps)
    a, b = _GRID[best]
    row = (
        int(a * 1e6),
        int(b * 1e6),
        int(math.floor((1.0 - (a + b)) * varhat * 1e12 + 0.5)),
        int(math.floor((a + b) * 1e6 + 0.5)),
        int(math.floor(varhat * 1e12 + 0.5)),
        int(math.floor(negll[best] * 1e6 + 0.5)),
        n,
    )
    return spark.createDataFrame(
        [row],
        "alpha_e6 long, beta_e6 long, omega_e12 long, persistence_e6"
        " long, varhat_e12 long, neg_ll_e6 long, n_returns long",
    )


_TE_SQL = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS xv,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS yv
      FROM events GROUP BY 1),
    dirs AS (
      SELECT d,
             CASE WHEN xv > lag(xv) OVER (ORDER BY d) THEN 1 ELSE 0 END
               AS x,
             CASE WHEN yv > lag(yv) OVER (ORDER BY d) THEN 1 ELSE 0 END
               AS y,
             row_number() OVER (ORDER BY d) AS i
      FROM daily QUALIFY lag(xv) OVER (ORDER BY d) IS NOT NULL),
    trip AS (
      SELECT b.y AS yn, a.y AS y, a.x AS x
      FROM dirs a JOIN dirs b ON b.i = a.i + 1),
    cnt AS (
      SELECT yn, y, x, CAST(count(*) AS BIGINT) AS c
      FROM trip GROUP BY 1, 2, 3),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
    marg AS (
      SELECT c.yn, c.y, c.x, c.c, t.n,
             sum(c.c) OVER (PARTITION BY c.y, c.x) AS c_yx,
             sum(c.c) OVER (PARTITION BY c.yn, c.y) AS c_nyy,
             sum(c.c) OVER (PARTITION BY c.y) AS c_y
      FROM cnt c CROSS JOIN tot t),
    terms AS (
      SELECT CAST(floor(CAST(c AS DOUBLE) / n
               * ln((CAST(c AS DOUBLE) * c_y)
                    / (CAST(c_yx AS DOUBLE) * c_nyy)) * 1e9 + 0.5)
             AS BIGINT) AS t_e9
      FROM marg),
    te_xy AS (SELECT CAST(sum(t_e9) AS BIGINT) AS v FROM terms),
    -- reverse direction: swap the roles of x and y
    tripr AS (
      SELECT b.x AS yn, a.x AS y, a.y AS x
      FROM dirs a JOIN dirs b ON b.i = a.i + 1),
    cntr AS (
      SELECT yn, y, x, CAST(count(*) AS BIGINT) AS c
      FROM tripr GROUP BY 1, 2, 3),
    margr AS (
      SELECT c.yn, c.y, c.x, c.c, t.n,
             sum(c.c) OVER (PARTITION BY c.y, c.x) AS c_yx,
             sum(c.c) OVER (PARTITION BY c.yn, c.y) AS c_nyy,
             sum(c.c) OVER (PARTITION BY c.y) AS c_y
      FROM cntr c CROSS JOIN tot t),
    termsr AS (
      SELECT CAST(floor(CAST(c AS DOUBLE) / n
               * ln((CAST(c AS DOUBLE) * c_y)
                    / (CAST(c_yx AS DOUBLE) * c_nyy)) * 1e9 + 0.5)
             AS BIGINT) AS t_e9
      FROM margr),
    te_yx AS (SELECT CAST(sum(t_e9) AS BIGINT) AS v FROM termsr)
    SELECT a.v AS te_view_to_purchase_e9,
           b.v AS te_purchase_to_view_e9,
           a.v - b.v AS net_flow_e9,
           t.n AS n_transitions
    FROM te_xy a CROSS JOIN te_yx b CROSS JOIN tot t
    """


@register(
    "transfer_entropy_daily",
    _TE_SQL,
    tags=("timeseries", "information", "causality", "exact-arith"),
)
def q_transfer_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transfer entropy between the daily view and purchase direction
    series in both directions (module docstring): exact integer triple
    counts, one ln per cell on an exact rational, e9 terms."""
    from pyspark.sql import Window

    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("bigint")
            .alias("xv"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("yv"),
        )
    )
    w = Window.orderBy("d")
    dirs = (
        daily.select(
            "d",
            F.when(F.col("xv") > F.lag("xv").over(w), 1)
            .otherwise(0)
            .alias("x"),
            F.when(F.col("yv") > F.lag("yv").over(w), 1)
            .otherwise(0)
            .alias("y"),
            F.lag("xv").over(w).alias("_px"),
            F.row_number().over(w).alias("i"),
        )
        .where(F.col("_px").isNotNull())
        .drop("_px")
        .localCheckpoint(eager=True)
    )

    def te(src: str, dst: str) -> DataFrame:
        a = dirs.select(
            F.col("i"), F.col(dst).alias("y"), F.col(src).alias("x")
        )
        bn = dirs.select(
            (F.col("i") - 1).alias("i"), F.col(dst).alias("yn")
        )
        cnt = (
            a.join(bn, "i")
            .groupBy("yn", "y", "x")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        tot = cnt.agg(F.sum("c").cast("bigint").alias("n"))
        wyx = Window.partitionBy("y", "x")
        wny = Window.partitionBy("yn", "y")
        wy = Window.partitionBy("y")
        marg = cnt.crossJoin(F.broadcast(tot)).select(
            "c",
            "n",
            F.sum("c").over(wyx).alias("c_yx"),
            F.sum("c").over(wny).alias("c_nyy"),
            F.sum("c").over(wy).alias("c_y"),
        )
        return marg.select(
            F.floor(
                F.col("c").cast("double")
                / F.col("n")
                * F.log(
                    (F.col("c").cast("double") * F.col("c_y"))
                    / (F.col("c_yx").cast("double") * F.col("c_nyy"))
                )
                * 1e9
                + 0.5
            )
            .cast("bigint")
            .alias("t_e9")
        ).agg(F.sum("t_e9").cast("bigint").alias("v"))

    n_tr = dirs.count() - 1
    xy = te("x", "y").select(F.col("v").alias("te_view_to_purchase_e9"))
    yx = te("y", "x").select(F.col("v").alias("te_purchase_to_view_e9"))
    return (
        xy.crossJoin(F.broadcast(yx))
        .select(
            "te_view_to_purchase_e9",
            "te_purchase_to_view_e9",
            (
                F.col("te_view_to_purchase_e9")
                - F.col("te_purchase_to_view_e9")
            ).alias("net_flow_e9"),
            F.lit(n_tr).cast("bigint").alias("n_transitions"),
        )
    )
