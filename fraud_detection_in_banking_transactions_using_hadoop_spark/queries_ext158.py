"""Extension batch 158 (round 6): SAX symbolic aggregate approximation
(the daily series as a 4-letter alphabet string; trigram 'words' give
the motif vocabulary that pattern databases index -- the symbolic
cousin of matrix_profile_motifs' numeric scan), the Ledoit-Wolf
shrinkage intensity for the embedding covariance (how much to pull
the sample covariance toward the identity before inverting --
the lambda* the whitening/mahalanobis tiers should use; pairs with
participation_ratio_embeddings on the same Gram cells), and the
autocorrelation-adjusted effective sample size of the daily series
(Geyer-truncated: n independent-equivalent observations -- the right
denominator for any CI on a dependent series).

Cross-engine discipline:
- SAX: z-scores from exact integer moments; breakpoints are the
  shared N(0,1) quartile literal +/-0.674489750196082; trigram words
  assemble via lead() over the day spine; counts are exact.
- Ledoit-Wolf: per-cell products quantized e6 (first moment) and
  their squares exactly from those ints, per-cell variance terms
  re-quantized e12 before the Frobenius sums -- lambda* is one double
  ratio.
- ESS: the rho_k come from the exact u = n*x - S autocovariance fold
  (ljung_box_q machinery); Geyer truncation at the first negative
  rho is an integer-deterministic rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_BP = 0.674489750196082  # N(0,1) upper quartile
_DIM = 64
_K_ESS = 7


@register(
    "sax_symbolic_words",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sxx
      FROM daily),
    sym AS (
      SELECT d2.d,
             CASE WHEN z < -{_BP!r} THEN 'a'
                  WHEN z < 0.0 THEN 'b'
                  WHEN z < {_BP!r} THEN 'c'
                  ELSE 'd' END AS s
      FROM (
        SELECT d, (CAST(v AS DOUBLE) - CAST(m.sx AS DOUBLE) / m.n)
                 / (sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)) / m.n)
                 AS z
        FROM daily CROSS JOIN mom m) d2),
    words AS (
      SELECT s || lead(s, 1) OVER (ORDER BY d)
               || lead(s, 2) OVER (ORDER BY d) AS w
      FROM sym),
    counts AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_occ
      FROM words WHERE w IS NOT NULL AND length(w) = 3 GROUP BY w)
    SELECT w AS sax_word, n_occ,
           (SELECT CAST(count(*) AS BIGINT) FROM counts) AS n_distinct_words
    FROM counts
    ORDER BY n_occ DESC, w
    LIMIT 10
    """,
    tags=("timeseries", "symbolic", "motif"),
)
def q_sax_symbolic_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization of daily revenue: global z-scores cut at the
    N(0,1) quartiles into the 4-letter alphabet a<b<c<d, then trigram
    'words' over consecutive days. The top-10 vocabulary is the
    symbolic motif table ('ddd' = sustained boom, 'dad' = spike-dip-
    spike); the distinct-word count vs the 64 possible is a regime-
    richness measure. z-scores from exact integer moments; the CASE
    breakpoints are shared literals, so both engines emit identical
    strings."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("v").cast(_DEC)).cast(_DEC).alias("sx"),
        F.sum(F.col("v").cast(_DEC) * F.col("v")).cast(_DEC).alias("sxx"),
    )
    z = (
        F.col("v").cast("double")
        - F.col("sx").cast("double") / F.col("n").cast("double")
    ) / (
        F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        )
        / F.col("n").cast("double")
    )
    sym = daily.crossJoin(F.broadcast(mom)).select(
        "d",
        F.when(z < -_BP, "a")
        .when(z < 0.0, "b")
        .when(z < _BP, "c")
        .otherwise("d")
        .alias("s"),
    )
    wd = Window.orderBy("d")
    words = sym.select(
        F.concat(
            F.col("s"), F.lead("s", 1).over(wd), F.lead("s", 2).over(wd)
        ).alias("w")
    ).where(F.col("w").isNotNull() & (F.length("w") == 3))
    counts = words.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )
    tot = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_words")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .orderBy(F.col("n_occ").desc(), "w")
        .limit(10)
        .select(F.col("w").alias("sax_word"), "n_occ", "n_distinct_words")
    )


@register(
    "ledoit_wolf_shrinkage",
    f"""
    WITH x AS (
      SELECT vec_id, i, j,
             CAST(embedding[i] AS DOUBLE) AS va,
             CAST(embedding[j] AS DOUBLE) AS vb
      FROM embeddings,
           (SELECT unnest(range(1, {_DIM + 1})) AS i) ii,
           (SELECT unnest(range(1, {_DIM + 1})) AS j) jj
      WHERE j >= i),
    cells AS (
      SELECT i, j,
             CAST(sum(CAST(floor(va * vb * 1e6 + 0.5) AS BIGINT)) AS HUGEINT)
               AS s1_e6,
             CAST(sum(CAST(floor(va * vb * 1e6 + 0.5) AS BIGINT)
                      * CAST(floor(va * vb * 1e6 + 0.5) AS BIGINT))
                  AS HUGEINT) AS s2_e12,
             CAST(count(*) AS BIGINT) AS n
      FROM x GROUP BY i, j),
    stats AS (
      SELECT i, j, n,
             CAST(s1_e6 AS DOUBLE) / 1e6 / n AS cij,
             CAST(s2_e12 AS DOUBLE) / 1e12 / n
               - (CAST(s1_e6 AS DOUBLE) / 1e6 / n)
                 * (CAST(s1_e6 AS DOUBLE) / 1e6 / n) AS varij
      FROM cells),
    mu_t AS (
      SELECT sum(CASE WHEN i = j THEN cij END) / {_DIM} AS mu FROM stats),
    quant AS (
      SELECT CASE WHEN s.i = s.j THEN 1 ELSE 2 END AS wgt,
             CAST(floor(s.varij / s.n * 1e15 + 0.5) AS BIGINT) AS b_e15,
             CAST(floor((s.cij - CASE WHEN s.i = s.j THEN m.mu ELSE 0.0 END)
                  * (s.cij - CASE WHEN s.i = s.j THEN m.mu ELSE 0.0 END)
                  * 1e15 + 0.5) AS BIGINT) AS d_e15
      FROM stats s CROSS JOIN mu_t m),
    agg AS (
      SELECT CAST(sum(wgt * b_e15) AS HUGEINT) AS b2,
             CAST(sum(wgt * d_e15) AS HUGEINT) AS d2
      FROM quant)
    SELECT round(m.mu, 6) AS mu_identity_scale,
           round(CAST(a.b2 AS DOUBLE) / 1e15, 9) AS b2_noise,
           round(CAST(a.d2 AS DOUBLE) / 1e15, 9) AS d2_dispersion,
           round(least(1.0, CAST(a.b2 AS DOUBLE) / CAST(a.d2 AS DOUBLE)), 6)
             AS lambda_star
    FROM agg a CROSS JOIN mu_t m
    """,
    tags=("embedding", "covariance", "shrinkage"),
)
def q_ledoit_wolf_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledoit-Wolf shrinkage intensity for the embedding covariance
    toward mu*I: lambda* = min(1, b^2/d^2) with b^2 the sampling noise
    of the covariance cells (mean per-cell variance / n) and d^2 the
    dispersion of C around the identity target -- the closed-form
    optimal blend before any inversion (Mahalanobis, whitening, LDA).
    Rides the same map-side Gram expansion as participation_ratio:
    per-cell first moments e6-exact, second moments exactly from those
    ints, Frobenius sums e15-requantized."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    x = (
        emb.select(v.alias("v"))
        .select("v", F.explode(F.sequence(F.lit(1), F.lit(_DIM))).alias("i"))
        .select(
            "v", "i", F.explode(F.sequence(F.col("i"), F.lit(_DIM))).alias("j")
        )
        .select(
            "i",
            "j",
            (
                F.floor(
                    F.try_element_at("v", F.col("i"))
                    * F.try_element_at("v", F.col("j"))
                    * 1e6
                    + 0.5
                )
            )
            .cast("bigint")
            .alias("p_e6"),
        )
    )
    cells = x.groupBy("i", "j").agg(
        F.sum("p_e6").cast(_DEC).alias("s1_e6"),
        F.sum(F.col("p_e6").cast(_DEC) * F.col("p_e6")).cast(_DEC).alias(
            "s2_e12"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    cij = F.col("s1_e6").cast("double") / 1e6 / F.col("n")
    varij = (
        F.col("s2_e12").cast("double") / 1e12 / F.col("n") - cij * cij
    )
    stats = cells.select("i", "j", "n", cij.alias("cij"), varij.alias("varij"))
    mu_t = stats.agg(
        (
            F.sum(F.when(F.col("i") == F.col("j"), F.col("cij"))) / _DIM
        ).alias("mu")
    )
    quant = stats.crossJoin(F.broadcast(mu_t)).select(
        F.when(F.col("i") == F.col("j"), 1).otherwise(2).alias("wgt"),
        F.floor(F.col("varij") / F.col("n") * 1e15 + 0.5)
        .cast("bigint")
        .alias("b_e15"),
        F.floor(
            (
                F.col("cij")
                - F.when(F.col("i") == F.col("j"), F.col("mu")).otherwise(0.0)
            )
            * (
                F.col("cij")
                - F.when(F.col("i") == F.col("j"), F.col("mu")).otherwise(0.0)
            )
            * 1e15
            + 0.5
        )
        .cast("bigint")
        .alias("d_e15"),
    )
    agg = quant.agg(
        F.sum(F.col("wgt") * F.col("b_e15")).cast(_DEC).alias("b2"),
        F.sum(F.col("wgt") * F.col("d_e15")).cast(_DEC).alias("d2"),
    )
    return agg.crossJoin(F.broadcast(mu_t)).select(
        F.round(F.col("mu"), 6).alias("mu_identity_scale"),
        F.round(F.col("b2").cast("double") / 1e15, 9).alias("b2_noise"),
        F.round(F.col("d2").cast("double") / 1e15, 9).alias("d2_dispersion"),
        F.round(
            F.least(
                F.lit(1.0),
                F.col("b2").cast("double") / F.col("d2").cast("double"),
            ),
            6,
        ).alias("lambda_star"),
    )


@register(
    "autocorr_ess_daily",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn, cents
      FROM daily),
    tot AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(cents) AS HUGEINT) AS sm
      FROM s),
    u AS (
      SELECT s.rn, CAST(s.cents AS HUGEINT) * t.n - t.sm AS u, t.n
      FROM s CROSS JOIN tot t),
    lagged AS (
      SELECT rn, u, unnest(range(0, {_K_ESS + 1})) AS lag_k FROM u),
    g AS (
      SELECT a.lag_k, sum(a.u * b.u) AS gk
      FROM lagged a JOIN u b ON b.rn = a.rn - a.lag_k
      GROUP BY a.lag_k),
    rho AS (
      SELECT g.lag_k, CAST(g.gk AS DOUBLE) / CAST(g0.gk AS DOUBLE) AS r
      FROM g CROSS JOIN (SELECT gk FROM g WHERE lag_k = 0) g0
      WHERE g.lag_k >= 1),
    trunc AS (
      SELECT coalesce(min(lag_k) - 1, {_K_ESS}) AS kmax
      FROM rho WHERE r < 0.0),
    ssum AS (
      SELECT CAST(sum(CAST(floor(r.r * 1e12 + 0.5) AS BIGINT)) AS HUGEINT)
               AS sr_e12
      FROM rho r CROSS JOIN trunc t WHERE r.lag_k <= t.kmax)
    SELECT CAST(t2.n AS BIGINT) AS n_days,
           CAST(tr.kmax AS INTEGER) AS truncation_lag,
           round(coalesce(CAST(ss.sr_e12 AS DOUBLE), 0.0) / 1e12, 6) + 0.0
             AS sum_rho,
           round(CAST(t2.n AS DOUBLE)
                 / (1.0 + 2.0 * coalesce(CAST(ss.sr_e12 AS DOUBLE), 0.0)
                    / 1e12), 2) AS ess,
           round(1.0 / (1.0 + 2.0 * coalesce(CAST(ss.sr_e12 AS DOUBLE), 0.0)
                 / 1e12), 6) AS ess_ratio
    FROM tot t2 CROSS JOIN trunc tr CROSS JOIN ssum ss
    """,
    tags=("timeseries", "inference", "ess"),
)
def q_autocorr_ess_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation-adjusted effective sample size of daily revenue:
    ESS = n / (1 + 2 sum rho_k), truncated at the first NEGATIVE
    autocorrelation (the Geyer initial-positive rule, capped at lag
    7) -- the honest n for any mean CI on a dependent series. The
    rho_k fold the exact u = n*x - S autocovariances (ljung_box_q
    machinery); each retained rho is e12-quantized so the sum is
    engine-order-free."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    s = daily.select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("rn"),
        "cents",
    )
    tot = s.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("cents").cast(_DEC).alias("sm"),
    )
    u = s.crossJoin(F.broadcast(tot)).select(
        "rn",
        (F.col("cents").cast(_DEC) * F.col("n") - F.col("sm")).alias("u"),
    )
    lagged = u.select(
        "rn",
        "u",
        F.explode(F.array(*[F.lit(k) for k in range(0, _K_ESS + 1)])).alias(
            "lag_k"
        ),
    )
    a = lagged.alias("a")
    b = u.alias("b")
    g = (
        a.join(b, F.col("b.rn") == F.col("a.rn") - F.col("a.lag_k"))
        .groupBy(F.col("a.lag_k").alias("lag_k"))
        .agg(F.sum(F.col("a.u") * F.col("b.u")).cast(_DEC).alias("gk"))
    )
    g0 = g.where(F.col("lag_k") == 0).select(F.col("gk").alias("g0"))
    rho = (
        g.where(F.col("lag_k") >= 1)
        .crossJoin(F.broadcast(g0))
        .select(
            "lag_k",
            (F.col("gk").cast("double") / F.col("g0").cast("double")).alias(
                "r"
            ),
        )
    )
    trunc = rho.where(F.col("r") < 0.0).agg(
        F.coalesce(F.min("lag_k") - 1, F.lit(_K_ESS)).alias("kmax")
    )
    ssum = (
        rho.crossJoin(F.broadcast(trunc))
        .where(F.col("lag_k") <= F.col("kmax"))
        .agg(
            F.sum(F.floor(F.col("r") * 1e12 + 0.5).cast("bigint"))
            .cast(_DEC)
            .alias("sr_e12")
        )
    )
    nn = tot.select(F.col("n").cast("bigint").alias("n_days"))
    sr = F.coalesce(F.col("sr_e12").cast("double"), F.lit(0.0)) / 1e12
    return (
        nn.crossJoin(F.broadcast(trunc))
        .crossJoin(F.broadcast(ssum))
        .select(
            "n_days",
            F.col("kmax").cast("integer").alias("truncation_lag"),
            (F.round(sr, 6) + F.lit(0.0)).alias("sum_rho"),
            F.round(
                F.col("n_days").cast("double") / (1.0 + 2.0 * sr), 2
            ).alias("ess"),
            F.round(1.0 / (1.0 + 2.0 * sr), 6).alias("ess_ratio"),
        )
    )
