"""Extension batch 170 (round 6): overdispersion-aware monitoring and
unit-root completion -- the Laney p'-chart on the daily error-event
share (classic p-chart limits assume binomial-only variation; this
testdata's day-to-day drift makes them fire constantly -- Laney's
z-scale moving-range correction widens the limits by the measured
between-day sigma, the fix Minitab ships), Crow-AMSAA reliability
growth (N(t) = lambda t^beta on the error-event process: beta < 1 =
the system is getting more reliable; the MLE is one log fold), and
the Phillips-Perron unit-root test (the ADF companion that corrects
the tau statistic NONPARAMETRICALLY with a Bartlett long-run variance
instead of adding lag terms -- engle_granger_adf's missing sibling).

Cross-engine discipline:
- Laney: daily counts are exact integers; per-day z-scores and their
  moving ranges e9-quantize before averaging.
- Crow-AMSAA: per-event ln(T/t_i) e9-quantizes into an exact sum;
  event times are integer microseconds.
- PP: the DF regression moments are exact integers (daily dollars);
  per-row residuals e3-quantize before the gamma_j lag-product folds;
  the Z_tau correction (Hamilton 17.6.8) is one shared double
  expression of those integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)

_DEC = "decimal(38,0)"
_L_PP = 4  # Bartlett truncation for the PP long-run variance
_D2 = 1.128  # E[moving range] / sigma for n=2


@register(
    "laney_pchart",
    f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS d,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events),
    daily AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(is_err) AS BIGINT) AS k
      FROM ev GROUP BY d),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(k) AS BIGINT) AS kk
      FROM daily),
    z AS (
      SELECT d.d, d.n, d.k, t.nn, t.kk,
             CAST(t.kk AS DOUBLE) / t.nn AS pbar,
             (CAST(d.k AS DOUBLE) / d.n - CAST(t.kk AS DOUBLE) / t.nn)
               / sqrt((CAST(t.kk AS DOUBLE) / t.nn)
                      * (1.0 - CAST(t.kk AS DOUBLE) / t.nn) / d.n) AS zi
      FROM daily d CROSS JOIN tot t),
    mr AS (
      SELECT CAST(floor(abs(zi - lag(zi) OVER (ORDER BY d)) * 1e9 + 0.5)
                  AS BIGINT) AS mr_e9
      FROM z),
    sig AS (
      SELECT CAST(sum(mr_e9) AS HUGEINT) AS s_mr,
             CAST(count(*) AS BIGINT) AS n_mr
      FROM mr WHERE mr_e9 IS NOT NULL),
    lim AS (
      SELECT CAST(s.s_mr AS DOUBLE) / 1e9 / s.n_mr / {_D2!r} AS sigz
      FROM sig s),
    flags AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             max(z.pbar) AS pbar,
             max(l.sigz) AS sigma_z,
             CAST(sum(CASE WHEN abs(z.zi) > 3.0 * l.sigz THEN 1 ELSE 0 END)
                  AS BIGINT) AS viol_laney,
             CAST(sum(CASE WHEN abs(z.zi) > 3.0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS viol_classic
      FROM z CROSS JOIN lim l)
    SELECT n_days, round(pbar, 6) AS p_bar, round(sigma_z, 4) AS sigma_z,
           viol_classic AS violations_classic_p,
           viol_laney AS violations_laney_p,
           sigma_z > 1.0 AS overdispersed
    FROM flags
    """,
    tags=("spc", "overdispersion", "pchart"),
)
def q_laney_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laney p'-chart of the daily error-event share: classic p-chart
    z-scores assume within-day binomial variation only; the moving
    range of those z-scores estimates the ACTUAL between-day sigma_z
    (MR-bar/1.128), and sigma_z > 1 is the overdispersion verdict.
    Violations under both rules are reported side by side -- when
    sigma_z >> 1 the classic chart's constant alarms are noise, the
    Laney count is the real signal. The hawkes/fano tier measures the
    same phenomenon on arrivals; this is the chart practitioners
    deploy."""
    ev = read_table(spark, sf_dir, "events").select(
        convert_event_ts(F.col("ts")).cast("date").alias("d"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
    )
    daily = ev.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("is_err").cast("bigint").alias("k"),
    )
    tot = daily.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("k").cast("bigint").alias("kk"),
    )
    pbar = F.col("kk").cast("double") / F.col("nn")
    zi = (F.col("k").cast("double") / F.col("n") - pbar) / F.sqrt(
        pbar * (1.0 - pbar) / F.col("n")
    )
    z = daily.crossJoin(F.broadcast(tot)).select(
        "d", "n", "k", pbar.alias("pbar"), zi.alias("zi")
    )
    mr = z.select(
        F.floor(
            F.abs(F.col("zi") - F.lag("zi").over(Window.orderBy("d")))
            * 1e9
            + 0.5
        )
        .cast("bigint")
        .alias("mr_e9")
    )
    sig = mr.where(F.col("mr_e9").isNotNull()).agg(
        F.sum("mr_e9").cast(_DEC).alias("s_mr"),
        F.count(F.lit(1)).cast("bigint").alias("n_mr"),
    )
    lim = sig.select(
        (
            F.col("s_mr").cast("double") / 1e9 / F.col("n_mr") / _D2
        ).alias("sigz")
    )
    flags = z.crossJoin(F.broadcast(lim)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("pbar").alias("pbar"),
        F.max("sigz").alias("sigma_z"),
        F.sum(
            F.when(F.abs(F.col("zi")) > 3.0 * F.col("sigz"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("viol_laney"),
        F.sum(F.when(F.abs(F.col("zi")) > 3.0, 1).otherwise(0))
        .cast("bigint")
        .alias("viol_classic"),
    )
    return flags.select(
        "n_days",
        F.round(F.col("pbar"), 6).alias("p_bar"),
        F.round(F.col("sigma_z"), 4).alias("sigma_z"),
        F.col("viol_classic").alias("violations_classic_p"),
        F.col("viol_laney").alias("violations_laney_p"),
        (F.col("sigma_z") > 1.0).alias("overdispersed"),
    )


@register(
    "crow_amsaa_growth",
    """
    WITH err AS (
      SELECT epoch_us(ts) AS us FROM events WHERE event_type = 'error'),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(min(us) AS BIGINT) AS t0,
             CAST(max(us) AS BIGINT) AS t_end
      FROM err),
    lg AS (
      SELECT CAST(sum(CAST(floor(ln(CAST(t.t_end - t.t0 + 1 AS DOUBLE)
                  / (e.us - t.t0 + 1)) * 1e9 + 0.5) AS BIGINT)) AS HUGEINT)
               AS sl_e9,
             max(t.n) AS n, max(t.t_end - t.t0 + 1) AS span_us
      FROM err e CROSS JOIN tot t),
    fit AS (
      SELECT n, span_us,
             CAST(n AS DOUBLE) / (CAST(sl_e9 AS DOUBLE) / 1e9) AS beta
      FROM lg)
    SELECT n AS n_failures,
           round(CAST(span_us AS DOUBLE) / 86400e6, 2) AS span_days,
           round(beta, 6) AS beta,
           round(CAST(n AS DOUBLE)
                 / power(CAST(span_us AS DOUBLE) / 86400e6, beta), 4)
             AS lambda_per_day_scale,
           round(CAST(span_us AS DOUBLE) / 86400e6
                 / (CAST(n AS DOUBLE) * beta) * 24.0, 3)
             AS instantaneous_mtbf_hours,
           beta < 1.0 AS reliability_growing
    FROM fit
    """,
    tags=("reliability", "growth", "amsaa"),
)
def q_crow_amsaa_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crow-AMSAA (NHPP power-law) reliability growth on the error
    event stream: beta_hat = n / sum ln(T/t_i) (time-terminated MLE,
    times measured from the first error), lambda_hat = n / T^beta.
    beta < 1 means failures decelerate (reliability growth), > 1
    means wear-out; the instantaneous MTBF 1/(lambda beta T^(beta-1))
    = T/(n beta) is the current-health number. Per-event log ratios e9-quantize
    into an exact fold; a homogeneous Poisson stream (this testdata's
    generator) should read beta ~ 1."""
    ev = read_table(spark, sf_dir, "events").where(
        F.col("event_type") == "error"
    )
    err = ev.select(F.unix_micros(convert_event_ts(F.col("ts"))).alias("us"))
    tot = err.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("us").cast("bigint").alias("t0"),
        F.max("us").cast("bigint").alias("t_end"),
    )
    lg = err.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.floor(
                F.log(
                    (F.col("t_end") - F.col("t0") + 1).cast("double")
                    / (F.col("us") - F.col("t0") + 1)
                )
                * 1e9
                + 0.5
            ).cast("bigint")
        )
        .cast(_DEC)
        .alias("sl_e9"),
        F.max("n").alias("n"),
        F.max(F.col("t_end") - F.col("t0") + 1).alias("span_us"),
    )
    beta = F.col("n").cast("double") / (F.col("sl_e9").cast("double") / 1e9)
    fit = lg.select("n", "span_us", beta.alias("beta"))
    span_days = F.col("span_us").cast("double") / 86400e6
    lam = F.col("n").cast("double") / F.pow(span_days, F.col("beta"))
    return fit.select(
        F.col("n").alias("n_failures"),
        F.round(span_days, 2).alias("span_days"),
        F.round(F.col("beta"), 6).alias("beta"),
        F.round(lam, 4).alias("lambda_per_day_scale"),
        F.round(
            span_days / (F.col("n").cast("double") * F.col("beta")) * 24.0,
            3,
        ).alias("instantaneous_mtbf_hours"),
        (F.col("beta") < 1.0).alias("reliability_growing"),
    )


@register(
    "phillips_perron",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn, v,
             lag(v) OVER (ORDER BY d) AS yl
      FROM daily),
    reg AS (
      SELECT rn, CAST(v - yl AS BIGINT) AS dy, CAST(yl AS BIGINT) AS yl
      FROM s WHERE yl IS NOT NULL),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(yl) AS HUGEINT) AS sy,
             CAST(sum(CAST(yl AS HUGEINT) * yl) AS HUGEINT) AS syy,
             CAST(sum(dy) AS HUGEINT) AS sd,
             CAST(sum(CAST(dy AS HUGEINT) * yl) AS HUGEINT) AS sdy
      FROM reg),
    ab AS (
      SELECT CAST(n AS DOUBLE) AS nd,
             CAST(n * sdy - sy * sd AS DOUBLE)
               / CAST(n * syy - sy * sy AS DOUBLE) AS rho,
             (CAST(sd AS DOUBLE)
              - CAST(n * sdy - sy * sd AS DOUBLE)
                / CAST(n * syy - sy * sy AS DOUBLE)
                * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE) AS alpha,
             CAST(n * syy - sy * sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy
      FROM mom),
    u AS (
      SELECT r.rn,
             CAST(floor((r.dy - ab.alpha - ab.rho * r.yl) * 1e3 + 0.5)
                  AS BIGINT) AS u_e3
      FROM reg r CROSS JOIN ab),
    lagged AS (
      SELECT rn, u_e3, unnest(range(0, {_L_PP + 1})) AS j FROM u),
    g AS (
      SELECT a.j, CAST(sum(CAST(a.u_e3 AS HUGEINT) * b.u_e3) AS HUGEINT)
               AS gj
      FROM lagged a JOIN u b ON b.rn = a.rn - a.j
      GROUP BY a.j),
    lrv AS (
      SELECT max(CASE WHEN j = 0 THEN CAST(gj AS DOUBLE) END) AS g0,
             CAST(sum(CASE WHEN j >= 1 THEN
                  ({_L_PP + 1} - j) * gj END) AS DOUBLE) AS wsum
      FROM g),
    st AS (
      SELECT ab.nd, ab.rho, ab.cyy,
             l.g0 / 1e6 / ab.nd AS gamma0,
             (l.g0 + 2.0 * l.wsum / {_L_PP + 1}) / 1e6 / ab.nd AS lam2
      FROM ab CROSS JOIN lrv l),
    zt AS (
      -- cyy is already the centered sum Sum (y - ybar)^2, so
      -- se(rho)^2 = gamma0 / cyy (no extra n)
      SELECT nd, rho, gamma0, lam2,
             sqrt(gamma0 / cyy) AS se_rho,
             rho / sqrt(gamma0 / cyy) AS tau
      FROM st)
    SELECT CAST(nd AS BIGINT) AS n_obs,
           round(rho, 6) AS rho_hat,
           round(tau, 4) AS tau_df,
           round(sqrt(gamma0 / lam2) * tau
                 - (lam2 - gamma0) / (2.0 * sqrt(lam2))
                   * (nd * se_rho / sqrt(gamma0)), 4) AS z_tau_pp,
           round(sqrt(gamma0 / lam2) * tau
                 - (lam2 - gamma0) / (2.0 * sqrt(lam2))
                   * (nd * se_rho / sqrt(gamma0)), 4) < -2.86
             AS reject_unit_root_5pct
    FROM zt
    """,
    tags=("timeseries", "unitroot", "pp"),
)
def q_phillips_perron(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phillips-Perron unit-root test (constant, no trend) on daily
    revenue: run the plain DF regression dy = alpha + rho y_{t-1} + u
    from exact integer moments, then correct tau nonparametrically
    with the Bartlett long-run variance of the residuals (L=4):
    Z_tau = sqrt(g0/lam2) tau - (lam2-g0)/(2 sqrt(lam2)) * n se(rho)/
    sqrt(g0) (Hamilton 17.6.8). Residuals e3-quantize per row before
    the gamma_j folds. Z_tau << -2.86 (the 5% constant-case critical
    value) rejects the unit root -- daily revenue is mean-reverting,
    which is why the forecast tier's seasonal-naive beats the random
    walk."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    wd = Window.orderBy("d")
    s = daily.select(
        F.row_number().over(wd).cast("bigint").alias("rn"),
        "v",
        F.lag("v").over(wd).alias("yl"),
    )
    reg = s.where(F.col("yl").isNotNull()).select(
        "rn",
        (F.col("v") - F.col("yl")).cast("bigint").alias("dy"),
        F.col("yl").cast("bigint").alias("yl"),
    )
    mom = reg.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("yl").cast(_DEC).alias("sy"),
        F.sum(F.col("yl").cast(_DEC) * F.col("yl")).cast(_DEC).alias("syy"),
        F.sum("dy").cast(_DEC).alias("sd"),
        F.sum(F.col("dy").cast(_DEC) * F.col("yl")).cast(_DEC).alias("sdy"),
    )
    rho = (
        F.col("n") * F.col("sdy") - F.col("sy") * F.col("sd")
    ).cast("double") / (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ).cast("double")
    ab = mom.select(
        F.col("n").cast("double").alias("nd"),
        rho.alias("rho"),
        (
            (F.col("sd").cast("double") - rho * F.col("sy").cast("double"))
            / F.col("n").cast("double")
        ).alias("alpha"),
        (
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                "double"
            )
            / F.col("n").cast("double")
        ).alias("cyy"),
    )
    u = reg.crossJoin(F.broadcast(ab)).select(
        "rn",
        F.floor(
            (F.col("dy") - F.col("alpha") - F.col("rho") * F.col("yl"))
            * 1e3
            + 0.5
        )
        .cast("bigint")
        .alias("u_e3"),
    )
    lagged = u.select(
        "rn",
        "u_e3",
        F.explode(F.array(*[F.lit(j) for j in range(0, _L_PP + 1)])).alias(
            "j"
        ),
    )
    a = lagged.alias("a")
    b = u.alias("b")
    g = (
        a.join(b, F.col("b.rn") == F.col("a.rn") - F.col("a.j"))
        .groupBy(F.col("a.j").alias("j"))
        .agg(
            F.sum(F.col("a.u_e3").cast(_DEC) * F.col("b.u_e3"))
            .cast(_DEC)
            .alias("gj")
        )
    )
    lrv = g.agg(
        F.max(F.when(F.col("j") == 0, F.col("gj").cast("double"))).alias(
            "g0"
        ),
        F.sum(
            F.when(
                F.col("j") >= 1,
                (_L_PP + 1 - F.col("j")) * F.col("gj"),
            )
        )
        .cast("double")
        .alias("wsum"),
    )
    st = ab.crossJoin(F.broadcast(lrv)).select(
        "nd",
        "rho",
        "cyy",
        (F.col("g0") / 1e6 / F.col("nd")).alias("gamma0"),
        (
            (F.col("g0") + 2.0 * F.col("wsum") / (_L_PP + 1))
            / 1e6
            / F.col("nd")
        ).alias("lam2"),
    )
    # cyy is already Sum (y - ybar)^2: se(rho)^2 = gamma0 / cyy
    se_rho = F.sqrt(F.col("gamma0") / F.col("cyy"))
    tau = F.col("rho") / se_rho
    zt = st.select(
        "nd",
        "rho",
        "gamma0",
        "lam2",
        se_rho.alias("se_rho"),
        tau.alias("tau"),
    )
    z_pp = F.sqrt(F.col("gamma0") / F.col("lam2")) * F.col("tau") - (
        F.col("lam2") - F.col("gamma0")
    ) / (2.0 * F.sqrt(F.col("lam2"))) * (
        F.col("nd") * F.col("se_rho") / F.sqrt(F.col("gamma0"))
    )
    return zt.select(
        F.col("nd").cast("bigint").alias("n_obs"),
        F.round(F.col("rho"), 6).alias("rho_hat"),
        F.round(F.col("tau"), 4).alias("tau_df"),
        F.round(z_pp, 4).alias("z_tau_pp"),
        (F.round(z_pp, 4) < -2.86).alias("reject_unit_root_5pct"),
    )
