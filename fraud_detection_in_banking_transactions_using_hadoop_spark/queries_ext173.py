"""Extension batch 173 (round 6): corpus-comparison stylometry and
dependence-robust FDR -- Craig's Zeta (document-frequency marker
words between the English and non-English subcorpora: the
segment-presence measure stylometrists use for authorship marker
lists, insensitive to one document spamming a word), Monroe's
'fightin' words' informative-Dirichlet log-odds (the Bayesian-shrunk
keyness z-scores that fix keyness_loglik's small-count blowups --
THE computational-social-science standard for 'what words
distinguish these two groups'), and the Benjamini-Yekutieli step-up
(bh_fdr_screen's companion that stays valid under ARBITRARY p-value
dependence by paying the harmonic-number factor).

Cross-engine discipline:
- Zeta is a pure ratio of exact document-frequency integers; ordering
  quantizes zeta at e9 with the word as tiebreak.
- Fightin' words: the Dirichlet prior alpha_w = alpha0 * pooled
  share is an exact rational of integer counts; the log-odds delta
  and its variance evaluate as one shared double expression; z
  orders by its e6 image.
- BY: identical p-value machinery to bh_fdr_screen (A&S 26.2.17 tail,
  e8-quantized p), with the harmonic number folded EXACTLY as
  sum(1e12 // rank) integers; emits BH and BY rejections side by
  side so the dependence penalty is a visible number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_MIN_DF = 5
_ALPHA0 = 500.0
_ALPHA_FDR = 0.05

_TOKS_SQL = """
    raw AS (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
             unnest(string_split(text, ' ')) AS tok
      FROM documents),
    toks AS (
      SELECT doc_id, grp, lower(tok) AS tok
      FROM raw WHERE length(tok) > 0)
"""


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        )
        .select("doc_id", "grp", F.lower(F.col("tok")).alias("tok"))
        .where(F.length("tok") > 0)
    )


@register(
    "craigs_zeta_markers",
    f"""
    WITH {_TOKS_SQL},
    ndocs AS (
      SELECT CAST(sum(grp) AS BIGINT) AS na,
             CAST(sum(1 - grp) AS BIGINT) AS nb
      FROM (SELECT doc_id, max(grp) AS grp FROM toks GROUP BY doc_id) g),
    df AS (
      SELECT tok,
             CAST(count(DISTINCT CASE WHEN grp = 1 THEN doc_id END)
                  AS BIGINT) AS dfa,
             CAST(count(DISTINCT CASE WHEN grp = 0 THEN doc_id END)
                  AS BIGINT) AS dfb
      FROM toks GROUP BY tok),
    z AS (
      SELECT d.tok, d.dfa, d.dfb, n.na, n.nb,
             CAST(d.dfa AS DOUBLE) / n.na
               - CAST(d.dfb AS DOUBLE) / n.nb AS zeta
      FROM df d CROSS JOIN ndocs n
      WHERE d.dfa + d.dfb >= {_MIN_DF}),
    q AS (
      SELECT tok, dfa, dfb, na, nb, zeta,
             CAST(floor(zeta * 1e9 + 0.5) AS BIGINT) AS z_e9
      FROM z)
    SELECT tok AS marker_word, dfa AS df_english, dfb AS df_other,
           round(CAST(dfa AS DOUBLE) / na, 6) AS share_english,
           round(CAST(dfb AS DOUBLE) / nb, 6) AS share_other,
           round(CAST(z_e9 AS DOUBLE) / 1e9, 6) AS zeta
    FROM q
    ORDER BY z_e9 DESC, tok
    LIMIT 10
    """,
    tags=("text", "stylometry", "zeta"),
)
def q_craigs_zeta_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Craig's Zeta marker words for the English vs non-English
    subcorpora, with each DOCUMENT as a segment: zeta_w =
    docshare_A(w) - docshare_B(w) in [-1, 1] -- +1 means every English
    document uses the word and no other document does. Because it
    counts documents, not tokens, a single word-spamming document
    cannot fake a marker (the failure mode of raw frequency keyness).
    Exact integer document frequencies; top-10 by the e9-quantized
    zeta."""
    toks = _toks(spark, sf_dir)
    ndocs = (
        toks.groupBy("doc_id")
        .agg(F.max("grp").alias("grp"))
        .agg(
            F.sum("grp").cast("bigint").alias("na"),
            F.sum(1 - F.col("grp")).cast("bigint").alias("nb"),
        )
    )
    df = toks.groupBy("tok").agg(
        F.countDistinct(
            F.when(F.col("grp") == 1, F.col("doc_id"))
        )
        .cast("bigint")
        .alias("dfa"),
        F.countDistinct(
            F.when(F.col("grp") == 0, F.col("doc_id"))
        )
        .cast("bigint")
        .alias("dfb"),
    )
    zeta = (
        F.col("dfa").cast("double") / F.col("na")
        - F.col("dfb").cast("double") / F.col("nb")
    )
    z = (
        df.crossJoin(F.broadcast(ndocs))
        .where(F.col("dfa") + F.col("dfb") >= _MIN_DF)
        .select(
            "tok",
            "dfa",
            "dfb",
            "na",
            "nb",
            zeta.alias("zeta"),
            F.floor(zeta * 1e9 + 0.5).cast("bigint").alias("z_e9"),
        )
    )
    return (
        z.orderBy(F.col("z_e9").desc(), "tok")
        .limit(10)
        .select(
            F.col("tok").alias("marker_word"),
            F.col("dfa").alias("df_english"),
            F.col("dfb").alias("df_other"),
            F.round(F.col("dfa").cast("double") / F.col("na"), 6).alias(
                "share_english"
            ),
            F.round(F.col("dfb").cast("double") / F.col("nb"), 6).alias(
                "share_other"
            ),
            F.round(F.col("z_e9").cast("double") / 1e9, 6).alias("zeta"),
        )
    )


@register(
    "fightin_words_logodds",
    f"""
    WITH {_TOKS_SQL},
    cnt AS (
      SELECT tok,
             CAST(sum(grp) AS BIGINT) AS ya,
             CAST(sum(1 - grp) AS BIGINT) AS yb
      FROM toks GROUP BY tok),
    tot AS (
      SELECT CAST(sum(ya) AS BIGINT) AS na, CAST(sum(yb) AS BIGINT) AS nb,
             CAST(sum(ya + yb) AS BIGINT) AS nn
      FROM cnt),
    sc AS (
      SELECT c.tok, c.ya, c.yb, t.na, t.nb,
             {_ALPHA0!r} * (CAST(c.ya + c.yb AS DOUBLE) / t.nn) AS aw
      FROM cnt c CROSS JOIN tot t
      WHERE c.ya + c.yb >= {_MIN_DF}),
    z AS (
      SELECT tok, ya, yb, aw,
             (ln((ya + aw) / (na + {_ALPHA0!r} - ya - aw))
              - ln((yb + aw) / (nb + {_ALPHA0!r} - yb - aw)))
               / sqrt(1.0 / (ya + aw) + 1.0 / (yb + aw)) AS zval
      FROM sc),
    q AS (
      SELECT tok, ya, yb, aw, zval,
             CAST(floor(zval * 1e6 + 0.5) AS BIGINT) AS z_e6
      FROM z)
    SELECT tok AS word, ya AS count_english, yb AS count_other,
           round(aw, 4) AS dirichlet_alpha,
           round(CAST(z_e6 AS DOUBLE) / 1e6, 6) AS z_logodds
    FROM q
    ORDER BY z_e6 DESC, tok
    LIMIT 10
    """,
    tags=("text", "keyness", "bayesian"),
)
def q_fightin_words_logodds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe et al.'s 'fightin' words': log-odds-ratio of each word
    between the English and non-English corpora with an INFORMATIVE
    Dirichlet prior (alpha_w = alpha0 * pooled share, alpha0 = 500),
    z-scored by the delta's approximate variance 1/(y_a + a_w) +
    1/(y_b + a_w). The prior shrinks rare-word log-odds toward zero
    -- exactly the small-count blowup that makes raw keyness lists
    unusable -- while frequent genuinely-skewed words keep large |z|.
    Top-10 English markers by the e6-quantized z."""
    toks = _toks(spark, sf_dir)
    cnt = toks.groupBy("tok").agg(
        F.sum("grp").cast("bigint").alias("ya"),
        F.sum(1 - F.col("grp")).cast("bigint").alias("yb"),
    )
    tot = cnt.agg(
        F.sum("ya").cast("bigint").alias("na"),
        F.sum("yb").cast("bigint").alias("nb"),
        F.sum(F.col("ya") + F.col("yb")).cast("bigint").alias("nn"),
    )
    aw = _ALPHA0 * (
        (F.col("ya") + F.col("yb")).cast("double") / F.col("nn")
    )
    sc = (
        cnt.crossJoin(F.broadcast(tot))
        .where(F.col("ya") + F.col("yb") >= _MIN_DF)
        .select("tok", "ya", "yb", "na", "nb", aw.alias("aw"))
    )
    zval = (
        F.log(
            (F.col("ya") + F.col("aw"))
            / (F.col("na") + _ALPHA0 - F.col("ya") - F.col("aw"))
        )
        - F.log(
            (F.col("yb") + F.col("aw"))
            / (F.col("nb") + _ALPHA0 - F.col("yb") - F.col("aw"))
        )
    ) / F.sqrt(
        1.0 / (F.col("ya") + F.col("aw")) + 1.0 / (F.col("yb") + F.col("aw"))
    )
    q = sc.select(
        "tok",
        "ya",
        "yb",
        "aw",
        zval.alias("zval"),
        F.floor(zval * 1e6 + 0.5).cast("bigint").alias("z_e6"),
    )
    return (
        q.orderBy(F.col("z_e6").desc(), "tok")
        .limit(10)
        .select(
            F.col("tok").alias("word"),
            F.col("ya").alias("count_english"),
            F.col("yb").alias("count_other"),
            F.round(F.col("aw"), 4).alias("dirichlet_alpha"),
            F.round(F.col("z_e6").cast("double") / 1e6, 6).alias(
                "z_logodds"
            ),
        )
    )


_AS_P = """(
      exp(-0.5 * az * az) * 0.3989422804014327
      * (0.319381530 * t - 0.356563782 * t * t + 1.781477937 * t * t * t
         - 1.821255978 * t * t * t * t + 1.330274429 * t * t * t * t * t)
    )"""


@register(
    "by_fdr_dependent",
    f"""
    WITH nat AS (
      SELECT n.n_name AS nation,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name),
    pooled AS (SELECT sum(n_urgent) AS gu, sum(n_orders) AS gn FROM nat),
    z AS (
      SELECT nation, n_orders, n_urgent,
             (CAST(n_urgent AS DOUBLE) / n_orders - CAST(gu AS DOUBLE) / gn)
             / sqrt(CAST(gu AS DOUBLE) / gn * (1 - CAST(gu AS DOUBLE) / gn)
                    / n_orders) AS zv
      FROM nat, pooled),
    p AS (
      SELECT nation, n_orders, n_urgent, zv,
             CAST(round(2 * {_AS_P} * 1e8, 0) AS BIGINT) AS p_e8
      FROM (SELECT *, abs(zv) AS az, 1 / (1 + 0.2316419 * abs(zv)) AS t
            FROM z) x),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY p_e8 ASC, nation ASC) AS rk,
             count(*) OVER () AS m
      FROM p),
    harm AS (
      SELECT CAST(sum(1000000000000 // rk) AS BIGINT) AS hm_e12
      FROM ranked),
    cuts AS (
      SELECT
        coalesce(max(CASE WHEN CAST(p_e8 AS DOUBLE) / 1e8
                          <= {_ALPHA_FDR} * rk / m THEN rk END), 0)
          AS k_bh,
        coalesce(max(CASE WHEN CAST(p_e8 AS DOUBLE) / 1e8
                          <= {_ALPHA_FDR} * rk
                             / (m * (CAST(h.hm_e12 AS DOUBLE) / 1e12))
                          THEN rk END), 0) AS k_by
      FROM ranked CROSS JOIN harm h),
    fin AS (
      SELECT r.nation, r.n_orders, r.n_urgent, r.zv, r.p_e8,
             CAST(r.rk AS BIGINT) AS rank_p,
             CAST(CASE WHEN r.rk <= c.k_bh THEN 1 ELSE 0 END AS INTEGER)
               AS rejected_bh,
             CAST(CASE WHEN r.rk <= c.k_by THEN 1 ELSE 0 END AS INTEGER)
               AS rejected_by
      FROM ranked r CROSS JOIN cuts c)
    SELECT nation, n_orders, n_urgent,
           round(zv, 6) AS z_score, p_e8, rank_p,
           rejected_bh, rejected_by
    FROM fin
    ORDER BY rank_p
    """,
    tags=("stats", "multiple-testing", "fdr"),
)
def q_by_fdr_dependent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli step-up on the same 25 nation urgent-share
    p-values as bh_fdr_screen, valid under ARBITRARY dependence: the
    threshold shrinks by the harmonic number c(m) = sum 1/i (~3.8 at
    m = 25), folded exactly as sum(1e12 DIV rank) integers. BH and BY
    rejections print side by side -- the rows BH rejects but BY keeps
    are exactly the discoveries that evaporate when you stop assuming
    independence."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_urgent"),
        )
    )
    glob = nat.agg(
        F.sum("n_urgent").alias("gu"), F.sum("n_orders").alias("gn")
    )
    g = F.col("gu").cast("double") / F.col("gn")
    zv = (
        F.col("n_urgent").cast("double") / F.col("n_orders") - g
    ) / F.sqrt(g * (1 - g) / F.col("n_orders"))
    z = nat.crossJoin(F.broadcast(glob)).withColumn("zv", zv)
    az = F.abs(F.col("zv"))
    t = 1 / (1 + 0.2316419 * az)
    tail = (
        F.exp(-0.5 * az * az)
        * 0.3989422804014327
        * (
            0.319381530 * t
            - 0.356563782 * t * t
            + 1.781477937 * t * t * t
            - 1.821255978 * t * t * t * t
            + 1.330274429 * t * t * t * t * t
        )
    )
    p = z.withColumn("p_e8", F.round(2 * tail * 1e8, 0).cast("bigint"))
    wrk = Window.orderBy(F.col("p_e8").asc(), F.col("nation").asc())
    ranked = p.select(
        "nation",
        "n_orders",
        "n_urgent",
        "zv",
        "p_e8",
        F.row_number().over(wrk).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    harm = ranked.agg(
        F.sum(F.expr("CAST(1000000000000 DIV rk AS BIGINT)"))
        .cast("bigint")
        .alias("hm_e12")
    )
    pd8 = F.col("p_e8").cast("double") / 1e8
    cuts = ranked.crossJoin(F.broadcast(harm)).agg(
        F.coalesce(
            F.max(
                F.when(
                    pd8 <= _ALPHA_FDR * F.col("rk") / F.col("m"),
                    F.col("rk"),
                )
            ),
            F.lit(0),
        ).alias("k_bh"),
        F.coalesce(
            F.max(
                F.when(
                    pd8
                    <= _ALPHA_FDR
                    * F.col("rk")
                    / (
                        F.col("m")
                        * (F.col("hm_e12").cast("double") / 1e12)
                    ),
                    F.col("rk"),
                )
            ),
            F.lit(0),
        ).alias("k_by"),
    )
    fin = ranked.crossJoin(F.broadcast(cuts)).select(
        "nation",
        "n_orders",
        "n_urgent",
        F.round(F.col("zv"), 6).alias("z_score"),
        "p_e8",
        F.col("rk").alias("rank_p"),
        F.when(F.col("rk") <= F.col("k_bh"), 1)
        .otherwise(0)
        .cast("integer")
        .alias("rejected_bh"),
        F.when(F.col("rk") <= F.col("k_by"), 1)
        .otherwise(0)
        .cast("integer")
        .alias("rejected_by"),
    )
    return fin.orderBy("rank_p")
