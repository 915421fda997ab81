"""Extension batch 95: corpus-linguistics statistics -- Dunning
log-likelihood keyness, the conditional-entropy ladder, and t-score
collocations.

pmi_collocations ranks association by pointwise MI (which overweights
rare pairs); this batch adds the three other instruments the corpus
workbench ships:

- keyness_loglik: which tokens distinguish the first half of the
  source axis from the second? Dunning's G2 on each token's 2x2
  table -- the keyness measure that stays calibrated where chi2
  breaks on small expecteds. e6-integer terms, top-20 by G2.
- entropy_rate_ladder: H0 = log2 |V| >= H1 (unigram) >= H2
  (conditional bigram) -- each step of the ladder is how much the
  previous token predicts the next; redundancy = 1 - H2/H0 is the
  compressibility bound. All e9-integer p*log2(p) terms.
- tscore_collocations: t = (f(ab) - f(a) f(b)/N) / sqrt(f(ab)) --
  the frequency-stable collocation score that complements PMI's
  rarity bias; top-20 adjacent pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

_TOKS_SQL = """
    toks AS (
      SELECT CAST(substr(source, 4) AS BIGINT) AS si,
             unnest(string_split(text, ' ')) AS tok
      FROM documents)
"""


# ---------------------------------------------------------------------------
# Dunning log-likelihood keyness between the two source halves.
# ---------------------------------------------------------------------------
@register(
    "keyness_loglik",
    f"""
    WITH {_TOKS_SQL},
    marked AS (
      SELECT tok, CASE WHEN si < 10 THEN 1 ELSE 0 END AS grp FROM toks),
    counts AS (
      SELECT tok,
             CAST(sum(grp) AS BIGINT) AS a,
             CAST(sum(1 - grp) AS BIGINT) AS b
      FROM marked GROUP BY tok),
    tot AS (
      SELECT CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
      FROM counts),
    terms AS (
      SELECT c.tok, c.a, c.b, t.ca, t.cb,
             CAST(c.a + c.b AS DOUBLE) * t.ca / (t.ca + t.cb) AS ea,
             CAST(c.a + c.b AS DOUBLE) * t.cb / (t.ca + t.cb) AS eb
      FROM counts c CROSS JOIN tot t),
    g2 AS (
      SELECT tok, a, b,
             CAST(floor(1e6 * (2.0 * (
               CASE WHEN a > 0 THEN a * ln(a / ea) ELSE 0.0 END
               + CASE WHEN b > 0 THEN b * ln(b / eb) ELSE 0.0 END)) + 0.5)
               AS BIGINT) AS g2_e6,
             CASE WHEN CAST(a AS DOUBLE) / ca > CAST(b AS DOUBLE) / cb
                  THEN 'first-half' ELSE 'second-half' END AS keyed_to
      FROM terms)
    SELECT tok AS token, a AS count_first, b AS count_second,
           round(g2_e6 / 1e6, 4) AS g2_keyness, keyed_to
    FROM g2 ORDER BY g2_e6 DESC, tok LIMIT 20
    """,
    tags=("text", "keyness", "exact-arith"),
)
def q_keyness_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning G2 keyness of every token between the src0-9 and
    src10-19 corpus halves: G2 = 2 sum O ln(O/E) over the token's
    2x2 table, e6-floored per token so the top-20 ordering is an
    exact integer sort (token tiebreak). The corpus-comparison
    statistic that stays honest at low counts where chi2 explodes --
    keyed_to says which half over-uses the token."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.substring("source", 4, 10).cast("bigint").alias("si"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    marked = toks.select(
        "tok", F.when(F.col("si") < 10, 1).otherwise(0).alias("grp")
    )
    counts = marked.groupBy("tok").agg(
        F.sum("grp").cast("bigint").alias("a"),
        F.sum(1 - F.col("grp")).cast("bigint").alias("b"),
    )
    tot = counts.agg(
        F.sum("a").cast("bigint").alias("ca"),
        F.sum("b").cast("bigint").alias("cb"),
    )
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "tok",
        "a",
        "b",
        "ca",
        "cb",
        (
            (F.col("a") + F.col("b")).cast("double")
            * F.col("ca")
            / (F.col("ca") + F.col("cb"))
        ).alias("ea"),
        (
            (F.col("a") + F.col("b")).cast("double")
            * F.col("cb")
            / (F.col("ca") + F.col("cb"))
        ).alias("eb"),
    )
    g2e6 = F.floor(
        F.lit(1e6)
        * (
            2.0
            * (
                F.when(
                    F.col("a") > 0,
                    F.col("a") * F.log(F.col("a") / F.col("ea")),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("b") > 0,
                    F.col("b") * F.log(F.col("b") / F.col("eb")),
                ).otherwise(F.lit(0.0))
            )
        )
        + 0.5
    ).cast("bigint")
    g2 = terms.select(
        "tok",
        "a",
        "b",
        g2e6.alias("g2_e6"),
        F.when(
            F.col("a").cast("double") / F.col("ca")
            > F.col("b").cast("double") / F.col("cb"),
            F.lit("first-half"),
        )
        .otherwise(F.lit("second-half"))
        .alias("keyed_to"),
    )
    return (
        g2.orderBy(F.col("g2_e6").desc(), "tok")
        .limit(20)
        .select(
            F.col("tok").alias("token"),
            F.col("a").alias("count_first"),
            F.col("b").alias("count_second"),
            F.round(F.col("g2_e6") / 1e6, 4).alias("g2_keyness"),
            "keyed_to",
        )
    )


_BIGRAM_SQL = """
    docs2 AS (SELECT string_split(text, ' ') AS w FROM documents),
    uni AS (
      SELECT w[i] AS tok
      FROM docs2, (SELECT unnest(range(1, 100000)) AS i) ix
      WHERE i <= len(w)),
    bi AS (
      SELECT w[i] AS t1, w[i + 1] AS t2
      FROM docs2, (SELECT unnest(range(1, 100000)) AS i) ix
      WHERE i + 1 <= len(w))
"""


# ---------------------------------------------------------------------------
# Conditional-entropy ladder H0 >= H1 >= H2.
# ---------------------------------------------------------------------------
@register(
    "entropy_rate_ladder",
    f"""
    WITH {_BIGRAM_SQL},
    uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok),
    un AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS v FROM uc),
    h1t AS (
      SELECT CAST(sum(CAST(floor(1e9 * (CAST(c AS DOUBLE) / u.n
                    * log2(CAST(u.n AS DOUBLE) / c)) + 0.5) AS BIGINT))
                  AS HUGEINT) AS h1_e9
      FROM uc CROSS JOIN un u),
    bc AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS c FROM bi
           GROUP BY t1, t2),
    bn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bc),
    hjt AS (
      SELECT CAST(sum(CAST(floor(1e9 * (CAST(c AS DOUBLE) / b.n
                    * log2(CAST(b.n AS DOUBLE) / c)) + 0.5) AS BIGINT))
                  AS HUGEINT) AS hj_e9
      FROM bc CROSS JOIN bn b)
    SELECT (SELECT v FROM un) AS vocab,
           round(log2(CAST((SELECT v FROM un) AS DOUBLE)), 6) AS h0_bits,
           round(CAST((SELECT h1_e9 FROM h1t) AS DOUBLE) / 1e9, 6) AS h1_bits,
           round(CAST((SELECT hj_e9 FROM hjt) AS DOUBLE) / 1e9
                 - CAST((SELECT h1_e9 FROM h1t) AS DOUBLE) / 1e9, 6)
             AS h2_bits,
           round(1.0 - (CAST((SELECT hj_e9 FROM hjt) AS DOUBLE) / 1e9
                        - CAST((SELECT h1_e9 FROM h1t) AS DOUBLE) / 1e9)
                 / log2(CAST((SELECT v FROM un) AS DOUBLE)), 6) AS redundancy
    """,
    tags=("text", "information", "exact-arith"),
)
def q_entropy_rate_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entropy-rate ladder of the corpus: H0 = log2 |V| (uniform
    bound), H1 = unigram entropy, H2 = H(joint bigram) - H1 (the
    conditional entropy of the next token given the previous) --
    each p log2(1/p) term e9-floored before its sum. redundancy =
    1 - H2/H0 bounds the achievable compression ratio; the drop
    H1 -> H2 is exactly how much one token of context buys."""
    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(F.split("text", " ").alias("w"))
    uni = base.select(F.explode("w").alias("tok"))
    bi = (
        base.filter(F.size("w") >= 2)
        .select(
            "w", F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i")
        )
        .select(
            F.element_at("w", F.col("i")).alias("t1"),
            F.element_at("w", F.col("i") + 1).alias("t2"),
        )
    )
    uc = uni.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    un = uc.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    h_term = lambda n: F.floor(  # noqa: E731
        F.lit(1e9)
        * (
            F.col("c").cast("double")
            / F.col(n)
            * F.log2(F.col(n).cast("double") / F.col("c"))
        )
        + 0.5
    ).cast("bigint")
    h1t = uc.crossJoin(F.broadcast(un)).agg(
        F.sum(h_term("n")).cast(_DEC).alias("h1_e9")
    )
    bc = bi.groupBy("t1", "t2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    bn = bc.agg(F.sum("c").cast("bigint").alias("n"))
    hjt = bc.crossJoin(F.broadcast(bn)).agg(
        F.sum(h_term("n")).cast(_DEC).alias("hj_e9")
    )
    out = (
        un.crossJoin(F.broadcast(h1t))
        .crossJoin(F.broadcast(hjt))
    )
    h1 = F.col("h1_e9").cast("double") / 1e9
    hj = F.col("hj_e9").cast("double") / 1e9
    h0 = F.log2(F.col("v").cast("double"))
    return out.select(
        F.col("v").alias("vocab"),
        F.round(h0, 6).alias("h0_bits"),
        F.round(h1, 6).alias("h1_bits"),
        F.round(hj - h1, 6).alias("h2_bits"),
        F.round(1.0 - (hj - h1) / h0, 6).alias("redundancy"),
    )


# ---------------------------------------------------------------------------
# t-score collocations (top 20 adjacent pairs).
# ---------------------------------------------------------------------------
@register(
    "tscore_collocations",
    f"""
    WITH {_BIGRAM_SQL},
    uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok),
    un AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
    bc AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS fab FROM bi
           GROUP BY t1, t2),
    scored AS (
      SELECT b.t1, b.t2, b.fab,
             CAST(floor(1e6 * ((CAST(b.fab AS DOUBLE)
                    - CAST(u1.c AS DOUBLE) * u2.c / u.n)
                    / sqrt(CAST(b.fab AS DOUBLE))) + 0.5) AS BIGINT) AS t_e6
      FROM bc b
      JOIN uc u1 ON u1.tok = b.t1
      JOIN uc u2 ON u2.tok = b.t2
      CROSS JOIN un u)
    SELECT t1 || ' ' || t2 AS bigram, fab AS pair_count,
           round(t_e6 / 1e6, 4) AS t_score
    FROM scored ORDER BY t_e6 DESC, t1, t2 LIMIT 20
    """,
    tags=("text", "collocation", "exact-arith"),
)
def q_tscore_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-score collocations: t = (f(ab) - f(a) f(b)/N)/sqrt(f(ab))
    for adjacent token pairs -- frequency-stable where PMI chases
    rarities, so the top-20 list (e6-integer sort, pair tiebreak) is
    the phrases that are BOTH common and associated. The second lens
    the collocation literature always pairs with PMI."""
    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(F.split("text", " ").alias("w"))
    uni = base.select(F.explode("w").alias("tok"))
    bi = (
        base.filter(F.size("w") >= 2)
        .select(
            "w", F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i")
        )
        .select(
            F.element_at("w", F.col("i")).alias("t1"),
            F.element_at("w", F.col("i") + 1).alias("t2"),
        )
    )
    uc = uni.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    un = uc.agg(F.sum("c").cast("bigint").alias("n"))
    bc = bi.groupBy("t1", "t2").agg(F.count(F.lit(1)).cast("bigint").alias("fab"))
    u1 = uc.select(F.col("tok").alias("t1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("tok").alias("t2"), F.col("c").alias("c2"))
    scored = (
        bc.join(F.broadcast(u1), "t1")
        .join(F.broadcast(u2), "t2")
        .crossJoin(F.broadcast(un))
        .select(
            "t1",
            "t2",
            "fab",
            F.floor(
                F.lit(1e6)
                * (
                    (
                        F.col("fab").cast("double")
                        - F.col("c1").cast("double") * F.col("c2") / F.col("n")
                    )
                    / F.sqrt(F.col("fab").cast("double"))
                )
                + 0.5
            )
            .cast("bigint")
            .alias("t_e6"),
        )
    )
    return (
        scored.orderBy(F.col("t_e6").desc(), "t1", "t2")
        .limit(20)
        .select(
            F.concat_ws(" ", "t1", "t2").alias("bigram"),
            F.col("fab").alias("pair_count"),
            F.round(F.col("t_e6") / 1e6, 4).alias("t_score"),
        )
    )
