"""Extension batch 137 (round 6): generalized linear models fitted
IN-ENGINE -- logistic regression (the canonical credit/fraud scoring
model; complements the WoE scorecard_points and ridge_regression_2d)
and a Poisson log-link GLM for per-customer activity counts, both via
3 Newton-Raphson / IRLS rounds expressed as distributed aggregates;
plus the ulcer index to complete the drawdown family (max_drawdown
measures the worst excursion, UI the root-mean-square of ALL of them).

Scale notes (the 100 TB story):
- logistic_newton_1d folds over the WEIGHTED (x_cents, y, count) spine
  (distinct extendedprice values saturate with the part-price domain),
  eagerly localCheckpointed once, so each Newton round is one small
  aggregate over spine rows -- the huber r6 fix applied from the
  start. Exactly N data passes for N rounds is the honest distributed
  GLM cost (Spark MLlib's LBFGS does the same).
- poisson_glm_loglink iterates over the per-customer count frame (one
  left join + aggregate, then |customers|-row folds).
- Cross-engine float discipline: every Newton-round sufficient
  statistic is quantized per row at e9 (floor(t*1e9 + 0.5), the
  round-half-up both engines share) and summed as DECIMAL(38,0)/
  HUGEINT, so engine-order float accumulation can never differ; the
  2x2 Hessian solve is a handful of double ops on identical integers.
- ulcer_index_daily: running max over the CALENDAR-bounded daily
  spine; squared drawdown percentages e9-quantized before the sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_N_ROUNDS = 3


def _e9(col: F.Column) -> F.Column:
    """Deterministic e9 quantizer: round-half-up via floor(x*1e9+0.5)
    (CAST alone rounds in DuckDB but truncates in Spark)."""
    return F.floor(col * 1e9 + 0.5).cast(_DEC)


_E9_SQL = "CAST(floor(({t}) * 1e9 + 0.5) AS HUGEINT)"


def _logistic_round_sql(i: int) -> str:
    """One unrolled Newton round as DuckDB CTE text: sufficient stats
    from the materialized spine x previous coefficients, then the 2x2
    solve. Mirrors the Spark fold exactly."""
    p = f"1.0 / (1.0 + exp(-(b.b0 + b.b1 * ((CAST(s.v AS DOUBLE) - b.mu) / b.sg))))"
    x = "((CAST(s.v AS DOUBLE) - b.mu) / b.sg)"
    c = "CAST(s.c AS DOUBLE)"
    return f"""
    stat{i} AS (
      SELECT b.b0, b.b1, b.mu, b.sg,
             sum({_E9_SQL.format(t=f"{c} * (s.y - {p})")}) AS g0,
             sum({_E9_SQL.format(t=f"{c} * (s.y - {p}) * {x}")}) AS g1,
             sum({_E9_SQL.format(t=f"{c} * {p} * (1.0 - {p})")}) AS h00,
             sum({_E9_SQL.format(t=f"{c} * {p} * (1.0 - {p}) * {x}")}) AS h01,
             sum({_E9_SQL.format(t=f"{c} * {p} * (1.0 - {p}) * {x} * {x}")}) AS h11
      FROM spine s CROSS JOIN it{i} b
      GROUP BY b.b0, b.b1, b.mu, b.sg),
    it{i + 1} AS (
      SELECT mu, sg,
             b0 + (CAST(h11 AS DOUBLE) * g0 - CAST(h01 AS DOUBLE) * g1)
                  / (CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                     - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE)) AS b0,
             b1 + (CAST(h00 AS DOUBLE) * g1 - CAST(h01 AS DOUBLE) * g0)
                  / (CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                     - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE)) AS b1
      FROM stat{i})
    """


_LOGISTIC_SQL = (
    """
    WITH spine AS MATERIALIZED (
      SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    mom AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n,
             CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS sx,
             CAST(sum(CAST(v AS HUGEINT) * v * c) AS HUGEINT) AS sxx,
             CAST(sum(y * c) AS HUGEINT) AS sy
      FROM spine),
    it0 AS (
      SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(n AS DOUBLE) AS sg,
             ln(CAST(sy AS DOUBLE) / CAST(n - sy AS DOUBLE)) AS b0,
             0.0 AS b1
      FROM mom),
    """
    + f"""
    {",".join(_logistic_round_sql(i).strip() for i in range(_N_ROUNDS))},
    dev AS (
      SELECT sum({_E9_SQL.format(
          t="CAST(s.c AS DOUBLE) * (s.y * ln(1.0 / (1.0 + exp(-(b.b0 + b.b1 * ((CAST(s.v AS DOUBLE) - b.mu) / b.sg)))))"
            " + (1 - s.y) * ln(1.0 - 1.0 / (1.0 + exp(-(b.b0 + b.b1 * ((CAST(s.v AS DOUBLE) - b.mu) / b.sg))))))")}) AS ll
      FROM spine s CROSS JOIN it{_N_ROUNDS} b),
    ll0 AS (
      SELECT sum({_E9_SQL.format(
          t="CAST(s.c AS DOUBLE) * (s.y * ln(CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE))"
            " + (1 - s.y) * ln(1.0 - CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE)))")}) AS ll
      FROM spine s CROSS JOIN mom m)
    SELECT CAST(m.n AS BIGINT) AS n_rows,
           round(b.b0, 6) + 0.0 AS beta0,
           round(b.b1, 6) + 0.0 AS beta1_per_sd,
           round(exp(b.b1), 6) AS odds_ratio_per_sd,
           round(-2.0 * CAST(d.ll AS DOUBLE) / 1e9, 6) AS deviance,
           round(1.0 - CAST(d.ll AS DOUBLE) / CAST(z.ll AS DOUBLE), 6) + 0.0
             AS mcfadden_r2
    FROM mom m CROSS JOIN it{_N_ROUNDS} b CROSS JOIN dev d CROSS JOIN ll0 z
    """
)


@register(
    "logistic_newton_1d",
    _LOGISTIC_SQL,
    tags=("ml", "glm", "exact-arith"),
)
def q_logistic_newton_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression of P(returnflag = 'R') on standardized
    extended price, fitted by 3 Newton-Raphson rounds over the weighted
    (value, label, count) spine. Init beta0 = logit(base rate), beta1 =
    0; each round folds the gradient and 2x2 Hessian as e9-quantized
    integer sums (engine-order-free) and applies the closed-form 2x2
    solve. Emits the coefficients, the odds ratio per 1 SD of price,
    the final deviance, and McFadden's pseudo-R^2. The spine is
    localCheckpointed once (EAGER registry class): each round is a
    small distributed aggregate, never a re-scan of the fact table."""
    li = read_table(spark, sf_dir, "lineitem")
    spine = (
        li.select(
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("v"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
        .groupBy("v", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    # r13: every 1-row frame here (moments, coefficient iterates) is a
    # bounded scalar set -- collect the values and re-enter as literals
    # (the kmeans/huber driver-fold pattern). The transcendental init
    # (ln of the base-rate odds) stays IN-ENGINE via a 1-row local job
    # so the double is the JVM's, bit-identical to the old broadcast
    # column; the Newton updates are pure IEEE +-*/ on collected exact
    # DECIMAL sums, identical in Python and JVM. Saves 5 checkpoint
    # jobs + every broadcast build and fuses the deviance and
    # null-likelihood passes into ONE spine aggregate.
    mom = spine.agg(
        F.sum("c").cast(_DEC).alias("n"),
        F.sum(F.col("v").cast(_DEC) * F.col("c")).cast(_DEC).alias("sx"),
        F.sum(F.col("v").cast(_DEC) * F.col("v") * F.col("c"))
        .cast(_DEC)
        .alias("sxx"),
        F.sum(F.col("y") * F.col("c")).cast(_DEC).alias("sy"),
    ).first()
    n_i, sx_i, sxx_i, sy_i = (int(mom[k]) for k in ("n", "sx", "sxx", "sy"))
    import math

    mu = float(sx_i) / float(n_i)
    sg = math.sqrt(float(n_i * sxx_i - sx_i * sx_i)) / float(n_i)
    spark = spine.sparkSession
    b0 = spark.range(1).select(
        F.log(F.lit(float(sy_i) / float(n_i - sy_i))).alias("b0")
    ).first()["b0"]
    b1 = 0.0

    def sigmoid_terms(b0v: float, b1v: float):
        x = (F.col("v").cast("double") - F.lit(mu)) / F.lit(sg)
        p = 1.0 / (1.0 + F.exp(-(F.lit(b0v) + F.lit(b1v) * x)))
        cd = F.col("c").cast("double")
        return spine.agg(
            F.sum(_e9(cd * (F.col("y") - p))).cast(_DEC).alias("g0"),
            F.sum(_e9(cd * (F.col("y") - p) * x)).cast(_DEC).alias("g1"),
            F.sum(_e9(cd * p * (1.0 - p))).cast(_DEC).alias("h00"),
            F.sum(_e9(cd * p * (1.0 - p) * x)).cast(_DEC).alias("h01"),
            F.sum(_e9(cd * p * (1.0 - p) * x * x)).cast(_DEC).alias("h11"),
        ).first()

    for _ in range(_N_ROUNDS):
        st = sigmoid_terms(b0, b1)
        g0, g1, h00, h01, h11 = (
            float(st[k]) for k in ("g0", "g1", "h00", "h01", "h11")
        )
        det = h00 * h11 - h01 * h01
        b0, b1 = b0 + (h11 * g0 - h01 * g1) / det, b1 + (
            h00 * g1 - h01 * g0
        ) / det

    x = (F.col("v").cast("double") - F.lit(mu)) / F.lit(sg)
    p = 1.0 / (1.0 + F.exp(-(F.lit(b0) + F.lit(b1) * x)))
    cd = F.col("c").cast("double")
    rate = float(sy_i) / float(n_i)
    lik = spine.agg(
        F.sum(
            _e9(cd * (F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1.0 - p)))
        )
        .cast(_DEC)
        .alias("ll"),
        F.sum(
            _e9(
                cd
                * (
                    F.col("y") * F.log(F.lit(rate))
                    + (1 - F.col("y")) * F.log(1.0 - F.lit(rate))
                )
            )
        )
        .cast(_DEC)
        .alias("llz"),
    )
    return (
        lik
        .select(
            F.lit(n_i).cast("bigint").alias("n_rows"),
            (F.round(F.lit(b0), 6) + F.lit(0.0)).alias("beta0"),
            (F.round(F.lit(b1), 6) + F.lit(0.0)).alias("beta1_per_sd"),
            F.round(F.exp(F.lit(b1)), 6).alias("odds_ratio_per_sd"),
            F.round(-2.0 * F.col("ll").cast("double") / 1e9, 6).alias("deviance"),
            (
                F.round(
                    1.0 - F.col("ll").cast("double") / F.col("llz").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("mcfadden_r2"),
        )
    )


def _poisson_round_sql(i: int) -> str:
    lam = "exp(b.b0 + b.b1 * ((CAST(s.bal AS DOUBLE) - b.mu) / b.sg))"
    x = "((CAST(s.bal AS DOUBLE) - b.mu) / b.sg)"
    return f"""
    pstat{i} AS (
      SELECT b.b0, b.b1, b.mu, b.sg,
             sum({_E9_SQL.format(t=f"(s.k - {lam})")}) AS g0,
             sum({_E9_SQL.format(t=f"(s.k - {lam}) * {x}")}) AS g1,
             sum({_E9_SQL.format(t=f"{lam}")}) AS h00,
             sum({_E9_SQL.format(t=f"{lam} * {x}")}) AS h01,
             sum({_E9_SQL.format(t=f"{lam} * {x} * {x}")}) AS h11
      FROM pspine s CROSS JOIN pit{i} b
      GROUP BY b.b0, b.b1, b.mu, b.sg),
    pit{i + 1} AS (
      SELECT mu, sg,
             b0 + (CAST(h11 AS DOUBLE) * g0 - CAST(h01 AS DOUBLE) * g1)
                  / (CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                     - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE)) AS b0,
             b1 + (CAST(h00 AS DOUBLE) * g1 - CAST(h01 AS DOUBLE) * g0)
                  / (CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                     - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE)) AS b1
      FROM pstat{i})
    """


_POISSON_SQL = f"""
    WITH pspine AS MATERIALIZED (
      SELECT c.c_custkey,
             CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS bal,
             CAST(count(o.o_orderkey) AS BIGINT) AS k
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    pmom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(bal AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(bal AS HUGEINT) * bal) AS HUGEINT) AS sxx,
             CAST(sum(k) AS HUGEINT) AS sk
      FROM pspine),
    pit0 AS (
      SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(n AS DOUBLE) AS sg,
             ln(CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) AS b0,
             0.0 AS b1
      FROM pmom),
    {",".join(_poisson_round_sql(i).strip() for i in range(_N_ROUNDS))},
    pearson AS (
      SELECT sum({_E9_SQL.format(
          t="(s.k - exp(b.b0 + b.b1 * ((CAST(s.bal AS DOUBLE) - b.mu) / b.sg)))"
            " * (s.k - exp(b.b0 + b.b1 * ((CAST(s.bal AS DOUBLE) - b.mu) / b.sg)))"
            " / exp(b.b0 + b.b1 * ((CAST(s.bal AS DOUBLE) - b.mu) / b.sg))")}) AS x2
      FROM pspine s CROSS JOIN pit{_N_ROUNDS} b)
    SELECT CAST(m.n AS BIGINT) AS n_customers,
           CAST(m.sk AS BIGINT) AS n_orders,
           round(b.b0, 6) + 0.0 AS beta0,
           round(b.b1, 6) + 0.0 AS beta1_per_sd,
           round(exp(b.b1), 6) AS rate_ratio_per_sd,
           round(CAST(p.x2 AS DOUBLE) / 1e9
                 / (CAST(m.n AS DOUBLE) - 2.0), 6) AS pearson_dispersion
    FROM pmom m CROSS JOIN pit{_N_ROUNDS} b CROSS JOIN pearson p
    """


@register(
    "poisson_glm_loglink",
    _POISSON_SQL,
    tags=("ml", "glm", "exact-arith"),
)
def q_poisson_glm_loglink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson GLM (log link) of per-customer order COUNTS on
    standardized account balance: 3 IRLS rounds over the per-customer
    frame (left join keeps the zero-order customers -- dropping them
    biases the intercept). Same e9-integer fold discipline as
    logistic_newton_1d; closes with the Pearson chi^2 / (n - 2)
    dispersion, the overdispersion diagnostic that motivates
    negbin_fit_user_events."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    spine = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("bal"),
        )
        .agg(F.count("o_orderkey").cast("bigint").alias("k"))
        .localCheckpoint(eager=True)
    )
    # r13: same literal driver-fold as logistic_newton_1d above.
    mom = spine.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("bal").cast(_DEC)).cast(_DEC).alias("sx"),
        F.sum(F.col("bal").cast(_DEC) * F.col("bal")).cast(_DEC).alias("sxx"),
        F.sum("k").cast(_DEC).alias("sk"),
    ).first()
    n_i, sx_i, sxx_i, sk_i = (int(mom[k]) for k in ("n", "sx", "sxx", "sk"))
    import math

    mu = float(sx_i) / float(n_i)
    sg = math.sqrt(float(n_i * sxx_i - sx_i * sx_i)) / float(n_i)
    b0 = spine.sparkSession.range(1).select(
        F.log(F.lit(float(sk_i) / float(n_i))).alias("b0")
    ).first()["b0"]
    b1 = 0.0

    for _ in range(_N_ROUNDS):
        x = (F.col("bal").cast("double") - F.lit(mu)) / F.lit(sg)
        lam = F.exp(F.lit(b0) + F.lit(b1) * x)
        st = spine.agg(
            F.sum(_e9(F.col("k") - lam)).cast(_DEC).alias("g0"),
            F.sum(_e9((F.col("k") - lam) * x)).cast(_DEC).alias("g1"),
            F.sum(_e9(lam)).cast(_DEC).alias("h00"),
            F.sum(_e9(lam * x)).cast(_DEC).alias("h01"),
            F.sum(_e9(lam * x * x)).cast(_DEC).alias("h11"),
        ).first()
        g0, g1, h00, h01, h11 = (
            float(st[k]) for k in ("g0", "g1", "h00", "h01", "h11")
        )
        det = h00 * h11 - h01 * h01
        b0, b1 = b0 + (h11 * g0 - h01 * g1) / det, b1 + (
            h00 * g1 - h01 * g0
        ) / det

    x = (F.col("bal").cast("double") - F.lit(mu)) / F.lit(sg)
    lam = F.exp(F.lit(b0) + F.lit(b1) * x)
    pearson = spine.agg(
        F.sum(_e9((F.col("k") - lam) * (F.col("k") - lam) / lam))
        .cast(_DEC)
        .alias("x2")
    )
    return pearson.select(
        F.lit(n_i).cast("bigint").alias("n_customers"),
        F.lit(sk_i).cast("bigint").alias("n_orders"),
        (F.round(F.lit(b0), 6) + F.lit(0.0)).alias("beta0"),
        (F.round(F.lit(b1), 6) + F.lit(0.0)).alias("beta1_per_sd"),
        F.round(F.exp(F.lit(b1)), 6).alias("rate_ratio_per_sd"),
        F.round(
            F.col("x2").cast("double") / 1e9 / (F.lit(float(n_i)) - 2.0),
            6,
        ).alias("pearson_dispersion"),
    )


@register(
    "ulcer_index_daily",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT d, cents,
             max(cents) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM daily),
    dd AS (
      SELECT CAST(floor(
               (100.0 * (peak - cents) / peak)
               * (100.0 * (peak - cents) / peak) * 1e9 + 0.5) AS HUGEINT)
               AS dd2_e9,
             CASE WHEN cents < peak THEN 1 ELSE 0 END AS under
      FROM s)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(under) AS BIGINT) AS n_underwater_days,
           round(sqrt(CAST(sum(dd2_e9) AS DOUBLE) / 1e9 / count(*)), 6)
             AS ulcer_index_pct
    FROM dd
    """,
    tags=("finance", "risk", "timeseries"),
)
def q_ulcer_index_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer index of the daily-revenue series: root-mean-square of
    the percentage drawdown from the running peak -- max_drawdown's
    companion that penalizes DURATION underwater, not just the single
    worst dip. Running max over the calendar-bounded daily spine
    (explicit ROWS frame, date-unique order); each squared drawdown is
    e9-quantized before the sum so the mean is engine-order-free."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    s = daily.select("cents", F.max("cents").over(w).alias("peak"))
    ddpct = 100.0 * (F.col("peak") - F.col("cents")) / F.col("peak")
    dd = s.select(
        F.floor(ddpct * ddpct * 1e9 + 0.5).cast(_DEC).alias("dd2_e9"),
        F.when(F.col("cents") < F.col("peak"), 1).otherwise(0).alias("under"),
    )
    agg = dd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("under").cast("bigint").alias("n_underwater_days"),
        F.sum("dd2_e9").cast(_DEC).alias("sdd2"),
    )
    return agg.select(
        "n_days",
        "n_underwater_days",
        F.round(
            F.sqrt(F.col("sdd2").cast("double") / 1e9 / F.col("n_days")), 6
        ).alias("ulcer_index_pct"),
    )
