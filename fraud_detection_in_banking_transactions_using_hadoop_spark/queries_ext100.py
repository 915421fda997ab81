"""Extension batch 100: the causal-robustness suite -- nearest-donor
synthetic control, placebo-timing DiD, and randomization inference.

diff_in_diff_promo ESTIMATES an effect; none of the registry yet
STRESS-TESTS one. These are the three falsification instruments every
credible observational study runs:

- synthetic_control_nn: pick the donor nation whose PRE-period
  monthly revenue path is closest (exact integer squared distance) to
  the treated nation's, then read the post-period gap. The
  one-donor nearest-neighbor core of synthetic control, fully
  deterministic.
- placebo_timing_did: re-run the DiD at two FAKE treatment dates; a
  real effect appears only at the true date. Three rows, one per
  cutoff, all from exact integer cell means.
- randomization_inference_did: re-assign 'treated' to each nation in
  turn and rank the true nation's |effect| among all 25 -- Fisher's
  exact-placebo p-value, no normality assumption anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_TREATED_NATION = 0
_TRUE_CUT = "1997-01-01"
_PLACEBO_CUTS = ("1995-01-01", "1996-01-01")

_MONTHLY_SQL = """
    monthly AS (
      SELECT c.c_nationkey AS nk, date_trunc('month', o.o_orderdate) AS m,
             CAST(sum(round(o.o_totalprice * 100, 0)) AS BIGINT) // 100 AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, date_trunc('month', o.o_orderdate))
"""


def _monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cu = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.date_trunc("month", "o_orderdate").alias("m"),
        )
        .agg(
            F.expr(
                "CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) DIV 100"
            ).alias("rev")
        )
    )


# ---------------------------------------------------------------------------
# Nearest-donor synthetic control for nation 0.
# ---------------------------------------------------------------------------
@register(
    "synthetic_control_nn",
    f"""
    WITH {_MONTHLY_SQL},
    treated AS (SELECT m, rev FROM monthly WHERE nk = {_TREATED_NATION}),
    donors AS (SELECT nk, m, rev FROM monthly WHERE nk != {_TREATED_NATION}),
    paired AS (
      SELECT d.nk, t.m < DATE '{_TRUE_CUT}' AS pre, t.rev AS trev, d.rev AS drev
      FROM treated t JOIN donors d ON t.m = d.m),
    per AS (
      SELECT nk,
             CAST(sum(CASE WHEN pre THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
             CAST(sum(CASE WHEN NOT pre THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
             CAST(sum(CASE WHEN pre THEN CAST(trev - drev AS HUGEINT)
                           * (trev - drev) ELSE 0 END) AS HUGEINT) AS ssd,
             CAST(sum(CASE WHEN pre THEN trev ELSE 0 END) AS BIGINT) AS t_pre,
             CAST(sum(CASE WHEN pre THEN drev ELSE 0 END) AS BIGINT) AS d_pre,
             CAST(sum(CASE WHEN NOT pre THEN trev ELSE 0 END) AS BIGINT)
               AS t_post,
             CAST(sum(CASE WHEN NOT pre THEN drev ELSE 0 END) AS BIGINT)
               AS d_post
      FROM paired GROUP BY nk),
    best AS (
      SELECT * FROM per WHERE n_pre > 0 AND n_post > 0
      ORDER BY CAST(ssd AS DOUBLE) / n_pre, nk LIMIT 1)
    SELECT CAST(nk AS INTEGER) AS donor_nation,
           n_pre AS n_pre_months,
           round(sqrt(CAST(ssd AS DOUBLE) / n_pre), 2) AS pre_rmse_dollars,
           round(CAST(t_post - d_post AS DOUBLE) / n_post, 2) + 0.0
             AS raw_post_gap_dollars,
           round(CAST(t_post - d_post AS DOUBLE) / n_post
                 - CAST(t_pre - d_pre AS DOUBLE) / n_pre, 2) + 0.0
             AS adjusted_att_dollars
    FROM best
    """,
    tags=("causal", "synthetic-control", "exact-arith"),
)
def q_synthetic_control_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-donor synthetic control: the donor nation minimizing
    the PER-COMMON-MONTH mean squared distance to nation 0's pre-1997 monthly
    revenue path (argmin with nation tiebreak), then the post-period
    per-common-month mean gap (all sums over the COMMON months of the
    pair -- sparse low-SF series make own-month means incomparable),
    raw and adjusted by the residual pre-period gap. The one-donor core of synthetic control -- and the
    adjusted_att is what a causal claim about nation 0 would rest
    on."""
    monthly = _monthly(spark, sf_dir)
    cut = F.lit(_TRUE_CUT).cast("date")
    treated = monthly.where(F.col("nk") == _TREATED_NATION).select(
        "m", F.col("rev").alias("trev")
    )
    donors = monthly.where(F.col("nk") != _TREATED_NATION).select(
        "nk", "m", F.col("rev").alias("drev")
    )
    paired = treated.join(donors, "m").select(
        "nk", (F.col("m") < cut).alias("pre"), "trev", "drev"
    )
    dd = (F.col("trev") - F.col("drev")).cast(_DEC)
    per = paired.groupBy("nk").agg(
        F.sum(F.when(F.col("pre"), 1).otherwise(0)).cast("bigint").alias("n_pre"),
        F.sum(F.when(~F.col("pre"), 1).otherwise(0)).cast("bigint").alias("n_post"),
        F.sum(F.when(F.col("pre"), dd * dd).otherwise(F.lit(0).cast(_DEC)))
        .cast(_DEC)
        .alias("ssd"),
        F.sum(F.when(F.col("pre"), F.col("trev")).otherwise(0))
        .cast("bigint")
        .alias("t_pre"),
        F.sum(F.when(F.col("pre"), F.col("drev")).otherwise(0))
        .cast("bigint")
        .alias("d_pre"),
        F.sum(F.when(~F.col("pre"), F.col("trev")).otherwise(0))
        .cast("bigint")
        .alias("t_post"),
        F.sum(F.when(~F.col("pre"), F.col("drev")).otherwise(0))
        .cast("bigint")
        .alias("d_post"),
    )
    best = (
        per.where((F.col("n_pre") > 0) & (F.col("n_post") > 0))
        .orderBy(F.col("ssd").cast("double") / F.col("n_pre"), "nk")
        .limit(1)
    )
    raw = (F.col("t_post") - F.col("d_post")).cast("double") / F.col("n_post")
    preg = (F.col("t_pre") - F.col("d_pre")).cast("double") / F.col("n_pre")
    return best.select(
        F.col("nk").cast("int").alias("donor_nation"),
        F.col("n_pre").alias("n_pre_months"),
        F.round(F.sqrt(F.col("ssd").cast("double") / F.col("n_pre")), 2).alias(
            "pre_rmse_dollars"
        ),
        (F.round(raw, 2) + 0.0).alias("raw_post_gap_dollars"),
        (F.round(raw - preg, 2) + 0.0).alias("adjusted_att_dollars"),
    )


# ---------------------------------------------------------------------------
# Placebo-timing DiD: the effect should exist only at the true cut.
# ---------------------------------------------------------------------------
def _did_cut_sql(cut: str, label: str) -> str:
    return f"""
      SELECT DATE '{cut}' AS cut, '{label}' AS kind,
             (CAST(sum(CASE WHEN nk = {_TREATED_NATION}
                    AND m >= DATE '{cut}' THEN rev END) AS DOUBLE)
              / sum(CASE WHEN nk = {_TREATED_NATION}
                    AND m >= DATE '{cut}' THEN 1 END)
              - CAST(sum(CASE WHEN nk = {_TREATED_NATION}
                    AND m < DATE '{cut}' THEN rev END) AS DOUBLE)
                / sum(CASE WHEN nk = {_TREATED_NATION}
                      AND m < DATE '{cut}' THEN 1 END))
             - (CAST(sum(CASE WHEN nk != {_TREATED_NATION}
                    AND m >= DATE '{cut}' THEN rev END) AS DOUBLE)
                / sum(CASE WHEN nk != {_TREATED_NATION}
                      AND m >= DATE '{cut}' THEN 1 END)
                - CAST(sum(CASE WHEN nk != {_TREATED_NATION}
                      AND m < DATE '{cut}' THEN rev END) AS DOUBLE)
                  / sum(CASE WHEN nk != {_TREATED_NATION}
                        AND m < DATE '{cut}' THEN 1 END)) AS effect
      FROM win_{label}"""


@register(
    "placebo_timing_did",
    f"""
    WITH {_MONTHLY_SQL},
    win_true AS (
      SELECT * FROM monthly
      WHERE m >= DATE '{_TRUE_CUT}' - INTERVAL 12 MONTH
        AND m < DATE '{_TRUE_CUT}' + INTERVAL 12 MONTH),
    win_p1 AS (
      SELECT * FROM monthly
      WHERE m >= DATE '{_PLACEBO_CUTS[0]}' - INTERVAL 12 MONTH
        AND m < DATE '{_PLACEBO_CUTS[0]}' + INTERVAL 12 MONTH),
    win_p2 AS (
      SELECT * FROM monthly
      WHERE m >= DATE '{_PLACEBO_CUTS[1]}' - INTERVAL 12 MONTH
        AND m < DATE '{_PLACEBO_CUTS[1]}' + INTERVAL 12 MONTH),
    effects AS (
      {_did_cut_sql(_TRUE_CUT, "true")}
      UNION ALL
      {_did_cut_sql(_PLACEBO_CUTS[0], "p1").replace("win_p1", "win_p1")}
      UNION ALL
      {_did_cut_sql(_PLACEBO_CUTS[1], "p2")}
    )
    SELECT strftime(cut, '%Y-%m-%d') AS cutoff,
           CASE WHEN kind = 'true' THEN 'true-treatment'
                ELSE 'placebo' END AS kind,
           round(effect, 2) + 0.0 AS did_effect_dollars
    FROM effects ORDER BY cutoff
    """,
    tags=("causal", "placebo", "exact-arith"),
)
def q_placebo_timing_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiD of nation 0 vs the rest at the TRUE 1997-01 cut and two
    placebo cuts (12-month windows either side): the per-cell monthly
    means are exact integer ratios, and a credible design shows an
    effect ONLY at the true date. The falsification table referees
    ask for -- diff_in_diff_promo estimates, this stress-tests."""
    monthly = _monthly(spark, sf_dir)
    rows = []
    for cut, label in [
        (_TRUE_CUT, "true-treatment"),
        (_PLACEBO_CUTS[0], "placebo"),
        (_PLACEBO_CUTS[1], "placebo"),
    ]:
        cutc = F.lit(cut).cast("date")
        win = monthly.where(
            (F.col("m") >= F.add_months(cutc, -12))
            & (F.col("m") < F.add_months(cutc, 12))
        )
        is_t = F.col("nk") == _TREATED_NATION
        is_post = F.col("m") >= cutc

        def cellmean(tcond, pcond):
            return F.sum(
                F.when(tcond & pcond, F.col("rev"))
            ).cast("double") / F.sum(F.when(tcond & pcond, 1))

        eff = win.agg(
            (
                (cellmean(is_t, is_post) - cellmean(is_t, ~is_post))
                - (cellmean(~is_t, is_post) - cellmean(~is_t, ~is_post))
            ).alias("effect")
        ).select(
            F.lit(cut).alias("cutoff"),
            F.lit(label).alias("kind"),
            (F.round("effect", 2) + 0.0).alias("did_effect_dollars"),
        )
        rows.append(eff)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("cutoff")


# ---------------------------------------------------------------------------
# Randomization inference: placebo-nation p-value for the DiD.
# ---------------------------------------------------------------------------
@register(
    "randomization_inference_did",
    f"""
    WITH {_MONTHLY_SQL},
    win AS (
      SELECT * FROM monthly
      WHERE m >= DATE '{_TRUE_CUT}' - INTERVAL 12 MONTH
        AND m < DATE '{_TRUE_CUT}' + INTERVAL 12 MONTH),
    per AS (
      SELECT nk,
             CAST(sum(CASE WHEN m >= DATE '{_TRUE_CUT}' THEN rev END)
                  AS BIGINT) AS s_post,
             CAST(sum(CASE WHEN m >= DATE '{_TRUE_CUT}' THEN 1 END)
                  AS BIGINT) AS n_post,
             CAST(sum(CASE WHEN m < DATE '{_TRUE_CUT}' THEN rev END)
                  AS BIGINT) AS s_pre,
             CAST(sum(CASE WHEN m < DATE '{_TRUE_CUT}' THEN 1 END)
                  AS BIGINT) AS n_pre
      FROM win GROUP BY nk),
    tot AS (
      SELECT CAST(sum(s_post) AS BIGINT) AS ts_post,
             CAST(sum(n_post) AS BIGINT) AS tn_post,
             CAST(sum(s_pre) AS BIGINT) AS ts_pre,
             CAST(sum(n_pre) AS BIGINT) AS tn_pre
      FROM per),
    eff AS (
      SELECT p.nk,
             (CAST(p.s_post AS DOUBLE) / p.n_post
              - CAST(p.s_pre AS DOUBLE) / p.n_pre)
             - (CAST(t.ts_post - p.s_post AS DOUBLE) / (t.tn_post - p.n_post)
                - CAST(t.ts_pre - p.s_pre AS DOUBLE) / (t.tn_pre - p.n_pre))
               AS e
      FROM per p CROSS JOIN tot t),
    ranked AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nations,
             CAST(sum(CASE WHEN abs(e) >=
                   abs((SELECT e FROM eff WHERE nk = {_TREATED_NATION}))
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
             (SELECT round(e, 2) + 0.0 FROM eff
              WHERE nk = {_TREATED_NATION}) AS true_effect,
             round(max(abs(e)), 2) AS max_abs_effect
      FROM eff)
    SELECT CAST(n_nations AS INTEGER) AS n_nations,
           true_effect AS true_effect_dollars,
           n_ge AS n_placebos_ge,
           round(CAST(n_ge AS DOUBLE) / n_nations, 4) AS ri_p_value,
           max_abs_effect AS max_abs_effect_dollars
    FROM ranked
    """,
    tags=("causal", "randomization-inference", "exact-arith"),
)
def q_randomization_inference_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher randomization inference for the nation-0 DiD: every
    nation takes a turn as placebo-treated (its DiD vs the other 24
    from exact per-nation pre/post integer sums and complement
    totals), and the p-value is the exact rank of |true effect| among
    all 25 -- no variance formula, no normality. If many placebos
    beat the true nation, the 'effect' is noise."""
    monthly = _monthly(spark, sf_dir)
    cutc = F.lit(_TRUE_CUT).cast("date")
    win = monthly.where(
        (F.col("m") >= F.add_months(cutc, -12))
        & (F.col("m") < F.add_months(cutc, 12))
    )
    is_post = F.col("m") >= cutc
    per = win.groupBy("nk").agg(
        F.sum(F.when(is_post, F.col("rev"))).cast("bigint").alias("s_post"),
        F.sum(F.when(is_post, 1)).cast("bigint").alias("n_post"),
        F.sum(F.when(~is_post, F.col("rev"))).cast("bigint").alias("s_pre"),
        F.sum(F.when(~is_post, 1)).cast("bigint").alias("n_pre"),
    )
    tot = per.agg(
        F.sum("s_post").cast("bigint").alias("ts_post"),
        F.sum("n_post").cast("bigint").alias("tn_post"),
        F.sum("s_pre").cast("bigint").alias("ts_pre"),
        F.sum("n_pre").cast("bigint").alias("tn_pre"),
    )
    eff = per.crossJoin(F.broadcast(tot)).select(
        "nk",
        (
            (
                F.col("s_post").cast("double") / F.col("n_post")
                - F.col("s_pre").cast("double") / F.col("n_pre")
            )
            - (
                (F.col("ts_post") - F.col("s_post")).cast("double")
                / (F.col("tn_post") - F.col("n_post"))
                - (F.col("ts_pre") - F.col("s_pre")).cast("double")
                / (F.col("tn_pre") - F.col("n_pre"))
            )
        ).alias("e"),
    )
    true_e = eff.where(F.col("nk") == _TREATED_NATION).select(
        F.col("e").alias("te")
    )
    ranked = eff.crossJoin(F.broadcast(true_e)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nations"),
        F.sum(F.when(F.abs(F.col("e")) >= F.abs(F.col("te")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_ge"),
        F.max(F.abs(F.col("e"))).alias("max_abs"),
        F.max("te").alias("te"),
    )
    return ranked.select(
        F.col("n_nations").cast("int").alias("n_nations"),
        (F.round("te", 2) + 0.0).alias("true_effect_dollars"),
        F.col("n_ge").alias("n_placebos_ge"),
        F.round(
            F.col("n_ge").cast("double") / F.col("n_nations"), 4
        ).alias("ri_p_value"),
        F.round("max_abs", 2).alias("max_abs_effect_dollars"),
    )
