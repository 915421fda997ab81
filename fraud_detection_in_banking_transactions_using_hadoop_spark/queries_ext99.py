"""Extension batch 99: HAC inference, survival split search, and the
Lorenz asymmetry coefficient.

- newey_west_slope_se: durbin_watson PROVED the daily-trend residuals
  are serially correlated; Newey-West is what you then do about
  inference -- the Bartlett-weighted HAC variance. With integer
  residuals E and the n-scaled centered regressor X = n t - St, the
  scores U = X E and autocovariances g_l = sum U_t U_{t-l} are exact
  integers, and S6 = 6 g0 + 2 sum (6-l) g_l keeps the Bartlett
  weights 1 - l/6 exact too: se_nw = n sqrt(S6/6) / SXX. The
  se_nw/se_ols ratio IS the 'how wrong were my OLS t-stats' number.
- survival_split_stump: decision_stump_split maximizes information
  gain on a LABEL; this maximizes LOGRANK separation of churn
  survival over the 9 spend-decile cuts -- the split search inside
  every survival tree. Per-cut risk sets come from ONE grouped
  two-level rank pass (partition = cut); O-E and variance terms are
  e9-floored integers per event time.
- lorenz_asymmetry: S = F(mu) + L(mu) says WHERE the Lorenz curve
  bends (S < 1: inequality from many small spenders; S > 1: from a
  few giants) -- the shape statistic gini integrates away. The mean
  crossing uses the exact comparison n*x < Total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import (
    ntile_from_rank,
    with_global_rank,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_NW_LAGS = 5
_CHURN_GAP_DAYS = 180


# ---------------------------------------------------------------------------
# Newey-West HAC standard error for the daily trend slope.
# ---------------------------------------------------------------------------
@register(
    "newey_west_slope_se",
    f"""
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) // 100 AS y
      FROM orders GROUP BY o_orderdate),
    seq AS (
      SELECT CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t, y FROM d),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS HUGEINT) AS st,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
             CAST(sum(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty
      FROM seq),
    fit AS (
      SELECT n, st,
             CAST(n * sty - st * sy AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS b,
             (CAST(sy AS DOUBLE) - CAST(n * sty - st * sy AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) * CAST(st AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
      FROM mom),
    scores AS (
      SELECT s.t, f.n,
             CAST(f.n * s.t - f.st AS BIGINT)
               * CAST(floor(CAST(s.y AS DOUBLE) - f.a - f.b * s.t + 0.5)
                      AS BIGINT) AS u,
             CAST(f.n * s.t - f.st AS HUGEINT)
               * CAST(f.n * s.t - f.st AS BIGINT) AS xx,
             CAST(floor(CAST(s.y AS DOUBLE) - f.a - f.b * s.t + 0.5) AS BIGINT)
               AS e
      FROM seq s CROSS JOIN fit f),
    gam AS (
      SELECT lg.l, CAST(sum(CAST(a.u AS HUGEINT) * b.u) AS HUGEINT) AS g
      FROM scores a
      JOIN (SELECT unnest(range(0, {_NW_LAGS + 1})) AS l) lg ON true
      JOIN scores b ON b.t = a.t - lg.l
      GROUP BY lg.l),
    base AS (
      SELECT (SELECT CAST(sum(xx) AS HUGEINT) FROM scores) AS sxx,
             (SELECT CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) FROM scores)
               AS se2,
             (SELECT CAST(sum(CASE WHEN l = 0 THEN 6 * g
                    ELSE 2 * ({_NW_LAGS + 1} - l) * g END) AS HUGEINT)
              FROM gam) AS s6,
             (SELECT max(n) FROM scores) AS n,
             (SELECT b FROM fit) AS b)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(b, 4) AS slope_dollars_per_day,
           round(sqrt(CAST(se2 AS DOUBLE) / (n - 2)
                      * CAST(n AS DOUBLE) * n / CAST(sxx AS DOUBLE)), 4)
             AS se_ols,
           round(CAST(n AS DOUBLE) * sqrt(CAST(s6 AS DOUBLE) / 6.0)
                 / CAST(sxx AS DOUBLE), 4) AS se_nw,
           round(CAST(n AS DOUBLE) * sqrt(CAST(s6 AS DOUBLE) / 6.0)
                 / CAST(sxx AS DOUBLE)
                 / sqrt(CAST(se2 AS DOUBLE) / (n - 2)
                        * CAST(n AS DOUBLE) * n / CAST(sxx AS DOUBLE)), 4)
             AS hac_inflation
    FROM base
    """,
    tags=("econometrics", "hac", "exact-arith"),
)
def q_newey_west_slope_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West (Bartlett, 5 lags) standard error of the daily
    revenue trend slope, against the OLS se: scores U = (n t - St) E
    and their lagged autocovariances are exact integers via the
    constant 6-row lag-grid self-join; the 6x-scaled Bartlett sum
    S6 = 6 g0 + 2 sum (6-l) g_l stays integer and se_nw =
    n sqrt(S6/6)/SXX. hac_inflation > 1 quantifies how much serial
    correlation was silently shrinking the OLS error bars."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.expr(
            "CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) DIV 100"
        ).alias("y")
    )
    seq = d.select(
        F.row_number().over(Window.orderBy("dt")).cast("bigint").alias("t"), "y"
    )
    mom = seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast(_DEC).alias("st"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("t").cast(_DEC) * F.col("t").cast(_DEC)).cast(_DEC).alias("stt"),
        F.sum(F.col("t").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("sty"),
    )
    nd = F.col("n").cast(_DEC)
    bnum = (nd * F.col("sty") - F.col("st") * F.col("sy")).cast("double")
    bden = (nd * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    fit = mom.select(
        "n",
        "st",
        (bnum / bden).alias("b"),
        (
            (F.col("sy").cast("double") - bnum / bden * F.col("st").cast("double"))
            / F.col("n").cast("double")
        ).alias("a"),
    )
    e = F.floor(
        F.col("y").cast("double") - F.col("a") - F.col("b") * F.col("t") + 0.5
    ).cast("bigint")
    x = (F.col("n").cast(_DEC) * F.col("t") - F.col("st")).cast(_DEC)
    scores = seq.crossJoin(F.broadcast(fit)).select(
        "t",
        "n",
        (x * e.cast(_DEC)).cast(_DEC).alias("u"),
        (x * x).cast(_DEC).alias("xx"),
        e.alias("e"),
    )
    lg = spark.createDataFrame([(l,) for l in range(_NW_LAGS + 1)], "l bigint")
    a = scores.select("t", F.col("u").alias("ua"))
    b2 = scores.select(F.col("t").alias("tb"), F.col("u").alias("ub"))
    gam = (
        a.crossJoin(F.broadcast(lg))
        .join(b2, F.col("tb") == F.col("t") - F.col("l"))
        .groupBy("l")
        .agg(F.sum(F.col("ua") * F.col("ub")).cast(_DEC).alias("g"))
    )
    s6 = gam.agg(
        F.sum(
            F.when(F.col("l") == 0, 6 * F.col("g")).otherwise(
                2 * (F.lit(_NW_LAGS + 1) - F.col("l")).cast(_DEC) * F.col("g")
            )
        )
        .cast(_DEC)
        .alias("s6")
    )
    base = scores.agg(
        F.sum("xx").cast(_DEC).alias("sxx"),
        F.sum(F.col("e").cast(_DEC) * F.col("e").cast(_DEC)).cast(_DEC).alias("se2"),
        F.max("n").alias("n"),
    ).crossJoin(F.broadcast(s6)).crossJoin(
        F.broadcast(fit.select("b"))
    )
    ndd = F.col("n").cast("double")
    se_ols = F.sqrt(
        F.col("se2").cast("double") / (F.col("n") - 2)
        * ndd
        * F.col("n")
        / F.col("sxx").cast("double")
    )
    se_nw = (
        ndd
        * F.sqrt(F.col("s6").cast("double") / 6.0)
        / F.col("sxx").cast("double")
    )
    return base.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round("b", 4).alias("slope_dollars_per_day"),
        F.round(se_ols, 4).alias("se_ols"),
        F.round(se_nw, 4).alias("se_nw"),
        F.round(se_nw / se_ols, 4).alias("hac_inflation"),
    )


# ---------------------------------------------------------------------------
# Survival split stump: logrank-optimal spend threshold for churn.
# ---------------------------------------------------------------------------
@register(
    "survival_split_stump",
    f"""
    WITH cust AS (
      SELECT o_custkey AS ck,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) // 100 AS spend,
             CAST(date_diff('day', min(o_orderdate), max(o_orderdate))
                  AS BIGINT) AS life,
             CASE WHEN max(o_orderdate) <
                    (SELECT max(o_orderdate) FROM orders)
                    - INTERVAL {_CHURN_GAP_DAYS} DAY
                  THEN 1 ELSE 0 END AS ev
      FROM orders GROUP BY o_custkey),
    ranked_sp AS (
      SELECT spend,
             CAST(ntile(9) OVER (ORDER BY spend, ck) AS BIGINT) AS tile
      FROM cust),
    cuts AS (
      SELECT tile AS cut_id, CAST(max(spend) AS BIGINT) AS cut
      FROM ranked_sp WHERE tile < 9 GROUP BY tile),
    assign AS (
      SELECT c.cut_id, c.cut,
             CASE WHEN u.spend > c.cut THEN 1 ELSE 0 END AS g,
             u.life, u.ev
      FROM cust u CROSS JOIN cuts c),
    cells AS (
      SELECT cut_id, cut, life,
             CAST(sum(g) AS BIGINT) AS c1,
             CAST(sum(1 - g) AS BIGINT) AS c0,
             CAST(sum(g * ev) AS BIGINT) AS d1,
             CAST(sum((1 - g) * ev) AS BIGINT) AS d0
      FROM assign GROUP BY cut_id, cut, life),
    totals AS (
      SELECT cut_id,
             CAST(sum(c1) AS BIGINT) AS n1t,
             CAST(sum(c0) AS BIGINT) AS n0t
      FROM cells GROUP BY cut_id),
    pre AS (
      SELECT cl.*, t.n1t, t.n0t,
             coalesce(sum(cl.c1) OVER w, 0) AS f1,
             coalesce(sum(cl.c0) OVER w, 0) AS f0
      FROM cells cl JOIN totals t ON cl.cut_id = t.cut_id
      WINDOW w AS (PARTITION BY cl.cut_id ORDER BY cl.life
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    terms AS (
      SELECT cut_id, cut,
             CAST(floor(1e9 * (d1 - CAST(d1 + d0 AS DOUBLE)
                               * (n1t - f1) / (n1t - f1 + n0t - f0)) + 0.5)
                  AS BIGINT) AS oe_e9,
             CASE WHEN n1t - f1 + n0t - f0 > 1 THEN
               CAST(floor(1e9 * (CAST(d1 + d0 AS DOUBLE)
                    * (n1t - f1) / (n1t - f1 + n0t - f0)
                    * (n0t - f0) / (n1t - f1 + n0t - f0)
                    * (n1t - f1 + n0t - f0 - d1 - d0)
                    / (n1t - f1 + n0t - f0 - 1)) + 0.5) AS BIGINT)
             ELSE 0 END AS v_e9
      FROM pre WHERE d1 + d0 > 0),
    z AS (
      SELECT cut_id, cut,
             CAST(sum(oe_e9) AS HUGEINT) AS soe,
             CAST(sum(v_e9) AS HUGEINT) AS sv
      FROM terms GROUP BY cut_id, cut)
    SELECT CAST(cut_id AS INTEGER) AS decile_cut,
           CAST(cut AS BIGINT) AS spend_cut_dollars,
           round(CAST(soe AS DOUBLE) / 1e9, 4) + 0.0 AS logrank_oe,
           round(CAST(soe AS DOUBLE) / 1e9
                 / sqrt(CAST(sv AS DOUBLE) / 1e9), 4) + 0.0 AS logrank_z
    FROM z
    ORDER BY abs(CAST(soe AS DOUBLE) / sqrt(CAST(sv AS DOUBLE) / 1e9)) DESC,
             cut_id
    LIMIT 1
    """,
    tags=("survival", "split-search", "exact-arith"),
)
def q_survival_split_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survival-tree root split: among the 9 spend-decile cuts,
    which threshold best separates churn survival (lifetime = first
    to last order; churned iff the last order predates the study end
    by 180+ days)? Per cut, risk sets fall out of ONE grouped rank
    pass over the (cut, lifetime) cells, and the logrank O-E and
    hypergeometric variance terms are e9-floored integers per event
    time. Output = the argmax |z| cut -- what every survival tree
    computes at its root, here with exact engine-stable ordering."""
    orders = read_table(spark, sf_dir, "orders")
    endd = orders.agg(
        F.date_sub(F.max("o_orderdate"), _CHURN_GAP_DAYS).alias("endcut")
    )
    cust = (
        orders.groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.expr(
                "CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) DIV 100"
            ).alias("spend"),
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
            .cast("bigint")
            .alias("life"),
            F.max("o_orderdate").alias("lastd"),
        )
        .crossJoin(F.broadcast(endd))
        .select(
            "ck",
            "spend",
            "life",
            F.when(F.col("lastd") < F.col("endcut"), 1).otherwise(0).alias("ev"),
        )
        # consumed 4x below (ntot, the rank pass's two scans, assign):
        # pin the O(customers) spine once instead of re-running the
        # orders groupBy per consumer (r13 optimization round)
        .localCheckpoint(eager=True)
    )
    ntot = cust.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    ranked_sp = (
        # bucket_bits: spend is whole nonneg dollars (bounded integer
        # domain) -- the DIV-projection bucket path drops the
        # approx_percentile stats job + range join of the generic path
        # (r6 recipe, applied r13; ranks are bit-identical)
        with_global_rank(cust, "spend", [F.col("spend"), F.col("ck")], bucket_bits=14)
        .crossJoin(F.broadcast(ntot))
        .select(
            "spend",
            ntile_from_rank(F.col("global_rank"), F.col("nn"), 9)
            .cast("bigint")
            .alias("tile"),
        )
    )
    cuts = (
        ranked_sp.where(F.col("tile") < 9)
        .groupBy(F.col("tile").alias("cut_id"))
        .agg(F.max("spend").cast("bigint").alias("cut"))
    )
    assign = cust.crossJoin(F.broadcast(cuts)).select(
        "cut_id",
        "cut",
        F.when(F.col("spend") > F.col("cut"), 1).otherwise(0).alias("g"),
        "life",
        "ev",
    )
    cells = assign.groupBy("cut_id", "cut", "life").agg(
        F.sum("g").cast("bigint").alias("c1"),
        F.sum(1 - F.col("g")).cast("bigint").alias("c0"),
        F.sum(F.col("g") * F.col("ev")).cast("bigint").alias("d1"),
        F.sum((1 - F.col("g")) * F.col("ev")).cast("bigint").alias("d0"),
        # consumed 3x (totals + the grouped rank pass's two scans)
    ).localCheckpoint(eager=True)
    totals = cells.groupBy("cut_id").agg(
        F.sum("c1").cast("bigint").alias("n1t"),
        F.sum("c0").cast("bigint").alias("n0t"),
    )
    pre = (
        with_global_rank(
            cells,
            "life",
            [F.col("life")],
            prefix_sum={"cf1": "c1", "cf0": "c0"},
            partition_cols=["cut_id"],
            bucket_bits=7,  # life = nonneg day counts <= ~2.5k: DIV buckets
        )
        .join(F.broadcast(totals), "cut_id")
        .select(
            "cut_id",
            "cut",
            "life",
            "d1",
            "d0",
            (F.col("cf1") - F.col("c1")).alias("f1"),
            (F.col("cf0") - F.col("c0")).alias("f0"),
            "n1t",
            "n0t",
        )
    )
    n1r = F.col("n1t") - F.col("f1")
    n0r = F.col("n0t") - F.col("f0")
    nr = n1r + n0r
    dall = (F.col("d1") + F.col("d0")).cast("double")
    oe = F.floor(
        F.lit(1e9) * (F.col("d1") - dall * n1r / nr) + 0.5
    ).cast("bigint")
    vv = F.when(
        nr > 1,
        F.floor(
            F.lit(1e9)
            * (
                dall
                * n1r
                / nr
                * n0r
                / nr
                * (nr - F.col("d1") - F.col("d0"))
                / (nr - 1)
            )
            + 0.5
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    terms = pre.where(F.col("d1") + F.col("d0") > 0).select(
        "cut_id", "cut", oe.alias("oe_e9"), vv.alias("v_e9")
    )
    z = terms.groupBy("cut_id", "cut").agg(
        F.sum("oe_e9").cast(_DEC).alias("soe"),
        F.sum("v_e9").cast(_DEC).alias("sv"),
    )
    zexpr = F.col("soe").cast("double") / F.sqrt(F.col("sv").cast("double") / 1e9)
    return (
        z.orderBy(F.abs(zexpr).desc(), "cut_id")
        .limit(1)
        .select(
            F.col("cut_id").cast("int").alias("decile_cut"),
            F.col("cut").cast("bigint").alias("spend_cut_dollars"),
            (F.round(F.col("soe").cast("double") / 1e9, 4) + 0.0).alias(
                "logrank_oe"
            ),
            (
                F.round(
                    F.col("soe").cast("double")
                    / 1e9
                    / F.sqrt(F.col("sv").cast("double") / 1e9),
                    4,
                )
                + 0.0
            ).alias("logrank_z"),
        )
    )


# ---------------------------------------------------------------------------
# Lorenz asymmetry coefficient of customer spend.
# ---------------------------------------------------------------------------
@register(
    "lorenz_asymmetry",
    """
    WITH spend AS (
      SELECT o_custkey AS ck,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS s
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT s,
             CAST(row_number() OVER (ORDER BY s, ck) AS BIGINT) AS r,
             sum(s) OVER (ORDER BY s, ck
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM spend),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS HUGEINT) AS st
      FROM spend),
    below AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(max(cum) AS BIGINT) AS lm
      FROM ranked, tot WHERE n * s < st),
    edge AS (
      SELECT
        (SELECT s FROM ranked, below WHERE r = m) AS xm,
        (SELECT s FROM ranked, below WHERE r = m + 1) AS xm1)
    SELECT t.n AS n_customers,
           round(CAST(t.st AS DOUBLE) / t.n / 100.0, 2) AS mean_spend_dollars,
           round((CAST(b.m AS DOUBLE)
                  + (CAST(t.st AS DOUBLE) / t.n - e.xm) / (e.xm1 - e.xm))
                 / t.n, 6) AS f_at_mean,
           round((CAST(b.lm AS DOUBLE)
                  + (CAST(t.st AS DOUBLE) / t.n - e.xm) / (e.xm1 - e.xm)
                    * e.xm1)
                 / CAST(t.st AS DOUBLE), 6) AS l_at_mean,
           round((CAST(b.m AS DOUBLE)
                  + (CAST(t.st AS DOUBLE) / t.n - e.xm) / (e.xm1 - e.xm))
                 / t.n
                 + (CAST(b.lm AS DOUBLE)
                    + (CAST(t.st AS DOUBLE) / t.n - e.xm) / (e.xm1 - e.xm)
                      * e.xm1)
                   / CAST(t.st AS DOUBLE), 6) AS lorenz_asymmetry
    FROM tot t CROSS JOIN below b CROSS JOIN edge e
    """,
    tags=("econ", "inequality", "exact-arith"),
)
def q_lorenz_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz asymmetry S = F(mu) + L(mu) of customer spend: the mean
    crossing index m is the exact integer count of n*x < Total,
    interpolated linearly between the order statistics x_(m) and
    x_(m+1) (Damgaard-Weiner). S = 1 means the Lorenz curve is
    symmetric; S > 1 says the inequality gini reports lives in a few
    giant spenders, S < 1 in many small ones -- operationally
    opposite situations with identical Gini."""
    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("s")
    )
    ranked = with_global_rank(
        spend, "s", [F.col("s"), F.col("ck")], prefix_sum={"cum": "s"}
    ).select("s", F.col("global_rank").alias("r"), "cum")
    tot = spend.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast(_DEC).alias("st"),
    )
    rt = ranked.crossJoin(F.broadcast(tot))
    below = rt.where(F.col("n").cast(_DEC) * F.col("s") < F.col("st")).agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.max("cum").cast("bigint").alias("lm"),
    )
    rb = rt.crossJoin(F.broadcast(below))
    xm = rb.where(F.col("r") == F.col("m")).select(F.col("s").alias("xm"))
    xm1 = rb.where(F.col("r") == F.col("m") + 1).select(F.col("s").alias("xm1"))
    out = (
        tot.crossJoin(F.broadcast(below))
        .crossJoin(F.broadcast(xm))
        .crossJoin(F.broadcast(xm1))
    )
    mu = F.col("st").cast("double") / F.col("n")
    delta = (mu - F.col("xm")) / (F.col("xm1") - F.col("xm"))
    f_mu = (F.col("m").cast("double") + delta) / F.col("n")
    l_mu = (
        F.col("lm").cast("double") + delta * F.col("xm1")
    ) / F.col("st").cast("double")
    return out.select(
        F.col("n").alias("n_customers"),
        F.round(mu / 100.0, 2).alias("mean_spend_dollars"),
        F.round(f_mu, 6).alias("f_at_mean"),
        F.round(l_mu, 6).alias("l_at_mean"),
        F.round(f_mu + l_mu, 6).alias("lorenz_asymmetry"),
    )
