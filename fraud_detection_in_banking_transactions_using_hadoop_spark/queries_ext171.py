"""Extension batch 171 (round 6): optimal coding and lexical-diversity
completions -- the EXACT Huffman expected code length for the nation
alphabet via the two-queue O(n) algorithm as a shared integer fold
(Spark `aggregate` == DuckDB recursive CTE; Huffman optimality has no
closed form, which is precisely why entropy alone under-reports the
achievable rate), MATTR (moving-average type-token ratio: the
lexical-diversity measure that, unlike raw TTR / heaps_law_beta, does
NOT shrink with document length), and the classical vocabulary-
richness trio per source (Guiraud R, Brunet W, Honore H -- the
hapax-weighted authorship statistics next to yules_k_richness).

Cross-engine discipline:
- Huffman: weights are exact customer counts; every step of the
  two-queue fold is integer CASE arithmetic on (leaf pointer, merged
  queue, cost) -- byte-identical across engines; out-of-range array
  reads go through try_element_at (Spark) == list indexing (DuckDB),
  both NULL.
- MATTR: per-window distinct counts are exact integers over a
  BOUNDED doc sample x position-range join (first 200 docs, first
  300 tokens, W = 50).
- Richness: ln terms quantize e9 per source after exact V/N/V1
  counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_W = 50  # MATTR window
_N_DOCS = 200
_MAX_TOK = 300


@register(
    "huffman_code_length",
    """
    WITH RECURSIVE w AS (
      SELECT CAST(count(*) AS BIGINT) AS wt
      FROM customer GROUP BY c_nationkey),
    arr AS MATERIALIZED (
      SELECT list(wt ORDER BY wt) AS ls,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(wt) AS BIGINT) AS tot
      FROM w),
    rec AS (
      SELECT 0 AS step, 1 AS i1, CAST([] AS BIGINT[]) AS q2,
             CAST(0 AS BIGINT) AS cost
      FROM arr
      UNION ALL
      SELECT r.step + 1,
             -- pick the two smallest among leaf heads and queue heads
             CASE
               WHEN a.ls[r.i1] IS NOT NULL
                    AND (r.q2[1] IS NULL OR a.ls[r.i1] <= r.q2[1])
               THEN CASE
                 WHEN a.ls[r.i1 + 1] IS NOT NULL
                      AND (r.q2[1] IS NULL OR a.ls[r.i1 + 1] <= r.q2[1])
                 THEN r.i1 + 2 ELSE r.i1 + 1 END
               ELSE CASE
                 WHEN a.ls[r.i1] IS NOT NULL
                      AND (r.q2[2] IS NULL OR a.ls[r.i1] <= r.q2[2])
                 THEN r.i1 + 1 ELSE r.i1 END
             END,
             CASE
               WHEN a.ls[r.i1] IS NOT NULL
                    AND (r.q2[1] IS NULL OR a.ls[r.i1] <= r.q2[1])
               THEN CASE
                 WHEN a.ls[r.i1 + 1] IS NOT NULL
                      AND (r.q2[1] IS NULL OR a.ls[r.i1 + 1] <= r.q2[1])
                 THEN list_append(r.q2, a.ls[r.i1] + a.ls[r.i1 + 1])
                 ELSE list_append(r.q2[2:], a.ls[r.i1] + r.q2[1]) END
               ELSE CASE
                 WHEN a.ls[r.i1] IS NOT NULL
                      AND (r.q2[2] IS NULL OR a.ls[r.i1] <= r.q2[2])
                 THEN list_append(r.q2[2:], r.q2[1] + a.ls[r.i1])
                 ELSE list_append(r.q2[3:], r.q2[1] + r.q2[2]) END
             END,
             r.cost + CASE
               WHEN a.ls[r.i1] IS NOT NULL
                    AND (r.q2[1] IS NULL OR a.ls[r.i1] <= r.q2[1])
               THEN CASE
                 WHEN a.ls[r.i1 + 1] IS NOT NULL
                      AND (r.q2[1] IS NULL OR a.ls[r.i1 + 1] <= r.q2[1])
                 THEN a.ls[r.i1] + a.ls[r.i1 + 1]
                 ELSE a.ls[r.i1] + r.q2[1] END
               ELSE CASE
                 WHEN a.ls[r.i1] IS NOT NULL
                      AND (r.q2[2] IS NULL OR a.ls[r.i1] <= r.q2[2])
                 THEN r.q2[1] + a.ls[r.i1]
                 ELSE r.q2[1] + r.q2[2] END
             END
      FROM rec r, arr a WHERE r.step < a.n - 1),
    fin AS (
      SELECT a.n, a.tot, r.cost
      FROM rec r CROSS JOIN arr a WHERE r.step = a.n - 1),
    ent AS (
      SELECT CAST(sum(CAST(floor(wt * ln(CAST(t.tot AS DOUBLE) / wt)
                  / ln(2.0) * 1e9 + 0.5) AS BIGINT)) AS HUGEINT) AS h_e9
      FROM w CROSS JOIN (SELECT tot FROM arr) t)
    SELECT f.n AS n_symbols, f.tot AS total_weight,
           CAST(f.cost AS BIGINT) AS huffman_cost,
           round(CAST(f.cost AS DOUBLE) / f.tot, 6) AS expected_bits,
           round(CAST(e.h_e9 AS DOUBLE) / 1e9 / f.tot, 6) AS entropy_bits,
           round(CAST(f.cost AS DOUBLE) / f.tot
                 - CAST(e.h_e9 AS DOUBLE) / 1e9 / f.tot, 6)
             AS redundancy_bits
    FROM fin f CROSS JOIN ent e
    """,
    tags=("coding", "fold", "entropy"),
)
def q_huffman_code_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Huffman expected code length for the 25-nation alphabet
    weighted by customer counts, via the two-queue O(n) construction
    (leaves sorted ascending; merged weights emerge nondecreasing, so
    two FIFO heads always hold the minima): 24 integer fold steps,
    Spark `aggregate` over a step range == DuckDB recursive CTE with
    list state, byte-identical CASE arithmetic. Reported against the
    exact entropy lower bound -- the redundancy L - H in [0, 1) bits
    is the price of integer code lengths, a number with NO closed
    form (why this fold exists)."""
    customer = read_table(spark, sf_dir, "customer")
    w = customer.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("wt")
    )
    arr = w.agg(
        F.expr("array_sort(collect_list(wt))").alias("ls"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("wt").cast("bigint").alias("tot"),
    )
    # two-queue fold: state (i1 leaf pointer, q2 merged queue, cost)
    h1 = "try_element_at(ls, acc.i1)"
    h2 = "try_element_at(ls, acc.i1 + 1)"
    g1 = "try_element_at(acc.q2, 1)"
    g2 = "try_element_at(acc.q2, 2)"
    t1 = f"({h1} IS NOT NULL AND ({g1} IS NULL OR {h1} <= {g1}))"
    t2_leaf = f"({h2} IS NOT NULL AND ({g1} IS NULL OR {h2} <= {g1}))"
    t2_queue = f"({h1} IS NOT NULL AND ({g2} IS NULL OR {h1} <= {g2}))"
    new_i1 = (
        f"CASE WHEN {t1} THEN CASE WHEN {t2_leaf} THEN acc.i1 + 2"
        f" ELSE acc.i1 + 1 END"
        f" ELSE CASE WHEN {t2_queue} THEN acc.i1 + 1 ELSE acc.i1 END END"
    )
    new_q2 = (
        f"CASE WHEN {t1} THEN CASE WHEN {t2_leaf}"
        f" THEN concat(acc.q2, array({h1} + {h2}))"
        f" ELSE concat(slice(acc.q2, 2, 1000), array({h1} + {g1})) END"
        f" ELSE CASE WHEN {t2_queue}"
        f" THEN concat(slice(acc.q2, 2, 1000), array({g1} + {h1}))"
        f" ELSE concat(slice(acc.q2, 3, 1000), array({g1} + {g2})) END END"
    )
    merged = (
        f"CASE WHEN {t1} THEN CASE WHEN {t2_leaf} THEN {h1} + {h2}"
        f" ELSE {h1} + {g1} END"
        f" ELSE CASE WHEN {t2_queue} THEN {g1} + {h1}"
        f" ELSE {g1} + {g2} END END"
    )
    fold = (
        "aggregate("
        "  sequence(1, CAST(n - 1 AS INT)),"
        "  named_struct('i1', 1, 'q2', CAST(array() AS ARRAY<BIGINT>),"
        "               'cost', CAST(0 AS BIGINT)),"
        f" (acc, s) -> named_struct("
        f"   'i1', {new_i1},"
        f"   'q2', {new_q2},"
        f"   'cost', acc.cost + {merged}))"
    )
    fin = arr.select("n", "tot", "ls", F.expr(fold).alias("st"))
    ent = w.crossJoin(F.broadcast(arr.select("tot"))).agg(
        F.sum(
            F.floor(
                F.col("wt")
                * F.log(F.col("tot").cast("double") / F.col("wt"))
                / F.log(F.lit(2.0))
                * 1e9
                + 0.5
            ).cast("bigint")
        )
        .cast(_DEC)
        .alias("h_e9")
    )
    return fin.crossJoin(F.broadcast(ent)).select(
        F.col("n").alias("n_symbols"),
        F.col("tot").alias("total_weight"),
        F.col("st.cost").cast("bigint").alias("huffman_cost"),
        F.round(F.col("st.cost").cast("double") / F.col("tot"), 6).alias(
            "expected_bits"
        ),
        F.round(
            F.col("h_e9").cast("double") / 1e9 / F.col("tot"), 6
        ).alias("entropy_bits"),
        F.round(
            F.col("st.cost").cast("double") / F.col("tot")
            - F.col("h_e9").cast("double") / 1e9 / F.col("tot"),
            6,
        ).alias("redundancy_bits"),
    )


@register(
    "mattr_sliding_ttr",
    f"""
    WITH parts AS (
      SELECT doc_id, string_split(text, ' ') AS ps
      FROM documents WHERE doc_id < {_N_DOCS}),
    toks AS (
      SELECT p.doc_id, CAST(idx.i AS BIGINT) AS pos, lower(p.ps[idx.i]) AS tok
      FROM parts p,
           (SELECT unnest(range(1, {_MAX_TOK + 1})) AS i) idx
      WHERE idx.i <= len(p.ps) AND length(p.ps[idx.i]) > 0),
    lens AS (
      SELECT doc_id, CAST(max(pos) AS BIGINT) AS len FROM toks GROUP BY doc_id),
    wins AS (
      SELECT t.doc_id, g.i,
             CAST(count(DISTINCT t.tok) AS BIGINT) AS v
      FROM toks t
      JOIN lens l ON l.doc_id = t.doc_id
      CROSS JOIN (SELECT unnest(range(1, {_MAX_TOK + 1})) AS i) g
      WHERE l.len >= {_W} AND g.i <= l.len - {_W} + 1
        AND t.pos >= g.i AND t.pos < g.i + {_W}
      GROUP BY t.doc_id, g.i),
    agg AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(v) AS HUGEINT) AS sv
      FROM wins),
    ttr AS (
      SELECT CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS raw_ttr
      FROM toks)
    SELECT a.n_docs, a.n_windows,
           round(CAST(a.sv AS DOUBLE) / {_W} / a.n_windows, 6) AS mattr_50,
           round(t.raw_ttr, 6) AS raw_ttr_pooled
    FROM agg a CROSS JOIN ttr t
    """,
    tags=("text", "diversity", "mattr"),
)
def q_mattr_sliding_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio (Covington's MATTR, W = 50)
    over the first 200 documents (first 300 tokens each): the mean
    distinct-token count across ALL sliding 50-token windows, divided
    by W. Unlike the pooled TTR printed beside it, MATTR does not
    decay with text length -- the comparable lexical-diversity number
    across corpora of different sizes. Window distinct counts are
    exact integers from a bounded position-range join."""
    docs = read_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _N_DOCS
    )
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("p0", "tok"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).cast("bigint").alias("pos"),
            F.lower(F.col("tok")).alias("tok"),
        )
        .where((F.col("pos") <= _MAX_TOK) & (F.length("tok") > 0))
    )
    lens = toks.groupBy("doc_id").agg(
        F.max("pos").cast("bigint").alias("len")
    )
    wins = (
        toks.join(
            lens.select(F.col("doc_id").alias("ld"), "len"),
            F.col("ld") == F.col("doc_id"),
        )
        .where(F.col("len") >= _W)
        .select(
            "doc_id",
            "pos",
            "tok",
            "len",
            F.explode(
                F.sequence(
                    F.greatest(F.lit(1), F.col("pos") - _W + 1),
                    F.least(F.col("pos"), F.col("len") - _W + 1),
                )
            ).alias("i"),
        )
        .groupBy("doc_id", "i")
        .agg(F.countDistinct("tok").cast("bigint").alias("v"))
    )
    agg = wins.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum("v").cast(_DEC).alias("sv"),
    )
    ttr = toks.agg(
        (
            F.countDistinct("tok").cast("double") / F.count(F.lit(1))
        ).alias("raw_ttr")
    )
    return agg.crossJoin(F.broadcast(ttr)).select(
        "n_docs",
        "n_windows",
        F.round(
            F.col("sv").cast("double") / _W / F.col("n_windows"), 6
        ).alias("mattr_50"),
        F.round(F.col("raw_ttr"), 6).alias("raw_ttr_pooled"),
    )


@register(
    "richness_guiraud_honore",
    """
    WITH raw AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    toks AS (
      SELECT source, lower(tok) AS tok FROM raw WHERE length(tok) > 0),
    freq AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY source, tok),
    per AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS v,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1
      FROM freq GROUP BY source)
    SELECT source, n AS n_tokens, v AS vocab, v1 AS hapax,
           round(CAST(v AS DOUBLE) / sqrt(CAST(n AS DOUBLE)), 4)
             AS guiraud_r,
           round(power(CAST(n AS DOUBLE),
                       power(CAST(v AS DOUBLE), -0.165)), 4) AS brunet_w,
           round(CASE WHEN v1 < v THEN
                   100.0 * ln(CAST(n AS DOUBLE))
                   / (1.0 - CAST(v1 AS DOUBLE) / v) END, 4) AS honore_h
    FROM per
    ORDER BY source
    """,
    tags=("text", "richness", "stylometry"),
)
def q_richness_guiraud_honore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical vocabulary-richness statistics per document source:
    Guiraud's R = V/sqrt(N) (the TTR normalization that is stable in
    N), Brunet's W = N^(V^-0.165) (LOWER = richer; the constant is
    Brunet's published 0.165), and Honore's H = 100 ln N/(1 - V1/V)
    (hapax-weighted; undefined when every type is a hapax). All from
    exact (N, V, V1) integer counts per source -- the stylometry
    completions next to yules_k_richness and hapax_ratio."""
    docs = read_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .select("source", F.lower(F.col("tok")).alias("tok"))
        .where(F.length("tok") > 0)
    )
    freq = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per = freq.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("v1"),
    )
    nd = F.col("n").cast("double")
    vd = F.col("v").cast("double")
    return per.orderBy("source").select(
        "source",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("vocab"),
        F.col("v1").alias("hapax"),
        F.round(vd / F.sqrt(nd), 4).alias("guiraud_r"),
        F.round(F.pow(nd, F.pow(vd, F.lit(-0.165))), 4).alias("brunet_w"),
        F.round(
            F.when(
                F.col("v1") < F.col("v"),
                100.0
                * F.log(nd)
                / (1.0 - F.col("v1").cast("double") / F.col("v")),
            ),
            4,
        ).alias("honore_h"),
    )
