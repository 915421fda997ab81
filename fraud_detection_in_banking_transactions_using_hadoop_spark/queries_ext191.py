"""Extension batch 191 (round 7): BPE merge training IN-ENGINE --
the tokenizer-construction step of an LLM data pipeline, learned as a
query and hash-oracled end to end.

Classic word-frequency byte-pair encoding (Sennrich et al. 2016): the
corpus reduces to (word, freq); each word starts as its character
sequence; each round counts adjacent symbol pairs weighted by word
frequency, merges the most frequent pair everywhere, and repeats.
Five rounds are unrolled (Spark: checkpointed vocab frame per round;
DuckDB: MATERIALIZED CTE per round -- the Schulze/Wagner-Whitin
pattern).

Symbol-string representation (the part that makes merge a pure
string op in BOTH engines): a word's symbols are joined by DOUBLE
unit-separators and padded with one on each edge --
'low' -> US+'l'+USUS+'o'+USUS+'w'+US. The merge of (a, b) is then
replace(P, US+a+USUS+b+US, US+ab+US):
- the surrounding USs make the match SYMBOL-BOUNDED (no false hit on
  a symbol whose suffix is `a`),
- the DOUBLE separator means consecutive occurrences share no
  characters, so left-to-right non-overlapping replace() -- identical
  semantics in Spark and DuckDB -- implements exactly the greedy
  all-occurrences BPE merge ('aaaa' under (a,a) -> 'aa','aa').

Everything is integer counts and deterministic string ops; the only
ordering is the per-round argmax (count DESC, then lexicographic pair
-- the canonical tiebreak), so the learned merge table is unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_ROUNDS = 5
_MAXSYM = 64  # words here are <= ~16 chars; bound for the index range


def _bpe_sql() -> str:
    rounds = []
    prev = "v0"
    tops = []
    for r in range(1, _ROUNDS + 1):
        rounds.append(f"""
    arr{r} AS MATERIALIZED (
      SELECT word, freq,
             string_split(substr(p, 2, length(p) - 2),
                          chr(31) || chr(31)) AS arr
      FROM {prev}),
    pr{r} AS (
      SELECT a.arr[i.i] AS a, a.arr[i.i + 1] AS b,
             CAST(sum(a.freq) AS BIGINT) AS cnt
      FROM arr{r} a, (SELECT unnest(range(1, {_MAXSYM})) AS i) i
      WHERE i.i < len(a.arr)
      GROUP BY 1, 2),
    top{r} AS MATERIALIZED (
      SELECT a, b FROM pr{r} ORDER BY cnt DESC, a, b LIMIT 1),
    v{r} AS MATERIALIZED (
      SELECT v.word, v.freq,
             replace(v.p,
                     chr(31) || t.a || chr(31) || chr(31) || t.b || chr(31),
                     chr(31) || t.a || t.b || chr(31)) AS p
      FROM {prev} v CROSS JOIN top{r} t)""")
        tops.append(f"top{r}")
        prev = f"v{r}"
    merge_cols = ", ".join(
        f"(SELECT a || '+' || b FROM top{r}) AS merge_{r}"
        for r in range(1, _ROUNDS + 1)
    )
    return f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    v0 AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq,
             chr(31) || array_to_string(string_split(word, ''),
                                        chr(31) || chr(31)) || chr(31) AS p
      FROM words
      WHERE word <> '' AND length(word) <= {_MAXSYM}
      GROUP BY word),
    {",".join(rounds)},
    fin AS (
      SELECT word, freq,
             string_split(substr(p, 2, length(p) - 2),
                          chr(31) || chr(31)) AS arr
      FROM v{_ROUNDS}),
    metrics AS (
      SELECT CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(freq * length(word)) AS BIGINT) AS tokens_before,
             CAST(sum(freq * len(arr)) AS BIGINT) AS tokens_after
      FROM fin),
    vocab AS (
      SELECT CAST(count(DISTINCT s) AS BIGINT) AS vocab_symbols_after
      FROM (SELECT unnest(arr) AS s FROM fin))
    SELECT m.n_words, {merge_cols},
           m.tokens_before, m.tokens_after,
           v.vocab_symbols_after,
           round(CAST(m.tokens_after AS DOUBLE) / m.tokens_before, 6)
             AS compression_ratio
    FROM metrics m CROSS JOIN vocab v
    """


@register(
    "bpe_merge_training",
    _bpe_sql(),
    tags=("llm-pipeline", "tokenizer", "iterative"),
)
def q_bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 5 BPE merges of the corpus in-engine: vocab =
    (word, freq); each round counts adjacent symbol pairs (frequency-
    weighted, via an index-lambda over the symbol arrays), picks the
    (count DESC, lexicographic) argmax, and applies it everywhere with
    one boundary-safe replace() on the double-separator symbol string.
    The vocab frame is checkpointed per round (5 fixed iterations, the
    Schulze/GLM loop pattern); the oracle unrolls the identical rounds
    as MATERIALIZED CTEs. Emits the learned merge table plus the
    tokens-per-word compression it buys -- the tokenizer-fertility
    counterpart, computed at training time."""
    docs = read_table(spark, sf_dir, "documents")
    sep, sepsep = "char(31)", "concat(char(31), char(31))"
    v = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(
            (F.col("word") != "")
            # Both engines cap words at _MAXSYM symbols so the oracle's
            # bounded pair-index range enumerates EXACTLY the same pairs
            # as the Spark side (r7 advice: an unbounded >64-char token
            # would silently diverge).
            & (F.length("word") <= _MAXSYM)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(
            "word",
            "freq",
            F.expr(
                f"concat({sep}, array_join(split(word, ''), {sepsep}), {sep})"
            ).alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    tops = []
    for r in range(1, _ROUNDS + 1):
        arr = v.select(
            "word",
            "freq",
            F.expr(
                f"split(substring(p, 2, length(p) - 2), {sepsep})"
            ).alias("arr"),
        )
        pairs = (
            arr.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(arr, 1, size(arr) - 1),"
                        " (x, i) -> struct(x AS a,"
                        " element_at(arr, i + 2) AS b))"
                    )
                ).alias("pr"),
            )
            .groupBy("pr.a", "pr.b")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        # r13: the winning pair is ONE row of two symbol strings --
        # collect it (TakeOrdered job, same as before) and re-enter as
        # literals instead of checkpointing a 1-row frame that every
        # later round and the final select re-broadcast
        top = (
            pairs.orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .select("a", "b")
            .first()
        )
        tops.append(top)
        v = (
            v.withColumn("a", F.lit(top["a"]))
            .withColumn("b", F.lit(top["b"]))
            .select(
                "word",
                "freq",
                F.expr(
                    f"replace(p, concat({sep}, a, {sepsep}, b, {sep}),"
                    f" concat({sep}, a, b, {sep}))"
                ).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    fin = v.select(
        "word",
        "freq",
        F.expr(f"split(substring(p, 2, length(p) - 2), {sepsep})").alias(
            "arr"
        ),
    )
    metrics = fin.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.col("freq") * F.length("word"))
        .cast("bigint")
        .alias("tokens_before"),
        F.sum(F.col("freq") * F.size("arr"))
        .cast("bigint")
        .alias("tokens_after"),
    )
    vocab = (
        fin.select(F.explode("arr").alias("s"))
        .agg(F.countDistinct("s").cast("bigint").alias("vocab_symbols_after"))
    )
    out = metrics.crossJoin(F.broadcast(vocab))
    for r, top in enumerate(tops, start=1):
        out = out.withColumn(f"merge_{r}", F.lit(top["a"] + "+" + top["b"]))
    return out.select(
        "n_words",
        *[f"merge_{r}" for r in range(1, _ROUNDS + 1)],
        "tokens_before",
        "tokens_after",
        "vocab_symbols_after",
        F.round(
            F.col("tokens_after").cast("double") / F.col("tokens_before"), 6
        ).alias("compression_ratio"),
    )
