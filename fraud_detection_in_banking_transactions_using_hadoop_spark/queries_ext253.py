"""Extension batch 253 (round 12): the 14th real codec and the exact
Kemeny rank aggregation that completes the social-choice tier.

- varint_delta_codec: LEB128 delta encoding of each day's sorted
  event-id stream -- the Parquet/protobuf integer-compression shape
  (delta against the predecessor, then 7-bit groups with a
  continuation bit). The encoder is REAL and byte-exact: every value's
  byte sequence is materialized (as zero-padded decimal byte text, the
  canonical form both engines hash identically), the day stream is the
  position-ordered concatenation, and the md5 of that stream is an
  output column -- a single flipped continuation bit anywhere
  mismatches the hash gate. Per day: value count, fixed-width bytes
  (8n), varint bytes (closed-form length sum), compression ratio in
  exact ppm, stream md5 prefix. Deltas are >= 1 (event_id is unique
  and sorted), the leading value is encoded absolute.

- kemeny_ranking: exact Kemeny-Young aggregation of the 30 daily
  event-type rankings (rank by daily count, count-desc/type-asc):
  pairwise preference matrix w[a][b] = #days a above b, then the
  120-permutation enumeration picks the order minimizing total Kendall
  distance (= maximizing pairwise agreements), lexicographic tiebreak.
  Spark folds the 20-row matrix driver-side (bounded fold class);
  the oracle enumerates permutations as a 5-way self-join filtered to
  distinct. Completes Borda/Copeland (ext54) and Schulze (ext170);
  the Condorcet-consistency law is pytest-pinned.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def varint_text_sql(v: str, div: str) -> str:
    """SQL text rendering the LEB128 byte sequence of the non-negative
    BIGINT expression `v` as concatenated zero-padded decimal byte
    triplets ('018' per byte) -- supports values < 2^35 (5 groups).
    `div` is the integer-division token ('DIV' for Spark, '//' for
    DuckDB); everything else is shared text."""

    def lp(x: str) -> str:
        return f"lpad(CAST({x} AS STRING), 3, '0')"

    def grp(i: int, last: bool) -> str:
        shifted = v if i == 0 else f"(({v}) {div} {128 ** i})"
        return lp(f"({shifted}) % 128" if not last else shifted)

    def enc(n_groups: int) -> str:
        parts = []
        for i in range(n_groups):
            last = i == n_groups - 1
            shifted = v if i == 0 else f"(({v}) {div} {128 ** i})"
            body = f"(({shifted}) % 128) + 128" if not last else shifted
            parts.append(lp(body))
        return " || ".join(parts)

    return (
        f"CASE WHEN ({v}) < 128 THEN {enc(1)}"
        f" WHEN ({v}) < 16384 THEN {enc(2)}"
        f" WHEN ({v}) < 2097152 THEN {enc(3)}"
        f" WHEN ({v}) < 268435456 THEN {enc(4)}"
        f" ELSE {enc(5)} END"
    )


_VARINT_LEN = (
    "(1 + CASE WHEN ({v}) >= 128 THEN 1 ELSE 0 END"
    " + CASE WHEN ({v}) >= 16384 THEN 1 ELSE 0 END"
    " + CASE WHEN ({v}) >= 2097152 THEN 1 ELSE 0 END"
    " + CASE WHEN ({v}) >= 268435456 THEN 1 ELSE 0 END)"
)


def _varint_sql(div: str) -> str:
    enc = varint_text_sql("d.v", div)
    ln = _VARINT_LEN.format(v="d.v")
    return f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS day, event_id,
             row_number() OVER (PARTITION BY CAST(ts AS DATE)
               ORDER BY event_id) AS pos
      FROM events),
    d AS (
      SELECT day, pos,
             CASE WHEN pos = 1 THEN event_id
                  ELSE event_id - lag(event_id) OVER (
                    PARTITION BY day ORDER BY event_id) END AS v
      FROM ev),
    encoded AS (
      SELECT day, pos, {enc} AS bytes_txt, {ln} AS n_bytes
      FROM d),
    per AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_values,
             CAST(8 * count(*) AS BIGINT) AS fixed_bytes,
             CAST(sum(n_bytes) AS BIGINT) AS varint_bytes,
             md5(string_agg(bytes_txt, '' ORDER BY pos)) AS stream_md5
      FROM encoded GROUP BY day)
    SELECT strftime(day, '%Y-%m-%d') AS day, n_values, fixed_bytes,
           varint_bytes,
           CAST((1000000 * varint_bytes) // fixed_bytes AS BIGINT)
             AS ratio_ppm,
           substr(stream_md5, 1, 16) AS stream_md5_prefix
    FROM per
    """


@register(
    "varint_delta_codec",
    _varint_sql("//"),
    tags=("multimodal", "codec", "compression", "exact-arith"),
)
def q_varint_delta_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day LEB128 delta compression of the sorted event-id stream
    (module docstring). The Spark plan renders each value's byte text
    with the SAME generated expression (DIV spelled per engine), folds
    the stream with sort_array(collect_list(struct(pos, txt))) -- one
    grouped exchange, deterministic order -- and hashes it; byte
    counts are closed-form length sums. JVM-side end to end."""
    ev = read_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_id"
    )
    wd = Window.partitionBy("day").orderBy("event_id")
    d = ev.select(
        "day",
        F.row_number().over(wd).alias("pos"),
        F.when(
            F.row_number().over(wd) == 1, F.col("event_id")
        )
        .otherwise(F.col("event_id") - F.lag("event_id").over(wd))
        .alias("v"),
    )
    enc = varint_text_sql("v", "DIV")
    ln = _VARINT_LEN.format(v="v")
    encoded = d.select(
        "day",
        "pos",
        F.expr(enc).alias("bytes_txt"),
        F.expr(ln).cast("bigint").alias("n_bytes"),
    )
    per = encoded.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        (8 * F.count(F.lit(1))).cast("bigint").alias("fixed_bytes"),
        F.sum("n_bytes").cast("bigint").alias("varint_bytes"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "bytes_txt"))
                    ),
                    lambda s: s["bytes_txt"],
                ),
                "",
            )
        ).alias("stream_md5"),
    )
    return per.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_values",
        "fixed_bytes",
        "varint_bytes",
        F.expr(
            "CAST((1000000 * varint_bytes) DIV fixed_bytes AS BIGINT)"
        ).alias("ratio_ppm"),
        F.substring("stream_md5", 1, 16).alias("stream_md5_prefix"),
    )


def varint_encode(values):
    """Reference Python LEB128 encoder (independent of the SQL text
    generator -- the invariant test cross-checks the two)."""
    out = bytearray()
    for v in values:
        v = int(v)
        assert v >= 0
        while v >= 128:
            out.append((v & 127) | 128)
            v >>= 7
        out.append(v)
    return bytes(out)


def varint_decode(buf):
    """Reference decoder: proves the encoding is invertible."""
    vals, v, shift = [], 0, 0
    for b in buf:
        v |= (b & 127) << shift
        if b & 128:
            shift += 7
        else:
            vals.append(v)
            v, shift = 0, 0
    return vals


# ---------------------------------------------------------------------------
# Kemeny-Young rank aggregation of the daily event-type rankings
# ---------------------------------------------------------------------------

_KEMENY_SQL = """
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS day, substr(event_type, 1, 1) AS ch
      FROM events),
    daily AS (
      SELECT day, ch, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2),
    ranked AS (
      SELECT day, ch,
             row_number() OVER (PARTITION BY day ORDER BY c DESC, ch)
               AS r
      FROM daily),
    w AS (
      SELECT a.ch AS ca, b.ch AS cb,
             CAST(sum(CASE WHEN a.r < b.r THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above
      FROM ranked a JOIN ranked b
        ON a.day = b.day AND a.ch <> b.ch
      GROUP BY a.ch, b.ch),
    types AS (SELECT DISTINCT ch FROM ev),
    nd AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS n_days FROM ev),
    perms AS (
      SELECT t0.ch AS p0, t1.ch AS p1, t2.ch AS p2, t3.ch AS p3,
             t4.ch AS p4
      FROM types t0, types t1, types t2, types t3, types t4
      WHERE t1.ch <> t0.ch AND t2.ch NOT IN (t0.ch, t1.ch)
        AND t3.ch NOT IN (t0.ch, t1.ch, t2.ch)
        AND t4.ch NOT IN (t0.ch, t1.ch, t2.ch, t3.ch)),
    scored AS (
      SELECT p.p0, p.p1, p.p2, p.p3, p.p4,
             CAST(sum(CASE WHEN
               (CASE w.ca WHEN p.p0 THEN 0 WHEN p.p1 THEN 1
                          WHEN p.p2 THEN 2 WHEN p.p3 THEN 3 ELSE 4 END)
               <
               (CASE w.cb WHEN p.p0 THEN 0 WHEN p.p1 THEN 1
                          WHEN p.p2 THEN 2 WHEN p.p3 THEN 3 ELSE 4 END)
               THEN w.n_above ELSE 0 END) AS BIGINT) AS agreements,
             CAST(sum(CASE WHEN
               (CASE w.ca WHEN p.p0 THEN 0 WHEN p.p1 THEN 1
                          WHEN p.p2 THEN 2 WHEN p.p3 THEN 3 ELSE 4 END)
               >
               (CASE w.cb WHEN p.p0 THEN 0 WHEN p.p1 THEN 1
                          WHEN p.p2 THEN 2 WHEN p.p3 THEN 3 ELSE 4 END)
               THEN w.n_above ELSE 0 END) AS BIGINT) AS disagreements
      FROM perms p CROSS JOIN w
      GROUP BY 1, 2, 3, 4, 5),
    best AS (
      SELECT * FROM scored
      ORDER BY agreements DESC, p0, p1, p2, p3, p4 LIMIT 1)
    SELECT p0 || '>' || p1 || '>' || p2 || '>' || p3 || '>' || p4
             AS kemeny_order,
           agreements, disagreements, nd.n_days
    FROM best CROSS JOIN nd
    """


@register(
    "kemeny_ranking",
    _KEMENY_SQL,
    tags=("social-choice", "ranking", "exact-arith"),
)
def q_kemeny_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kemeny-Young consensus over the 30 daily event-type
    rankings (module docstring): Spark computes the 20-row pairwise
    matrix distributed, collects it (bounded fold class), enumerates
    the 120 permutations driver-side with the same lexicographic
    tiebreak, and emits the optimum with its agreement/disagreement
    totals."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import (
        collect_nonempty,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        F.substring("event_type", 1, 1).alias("ch"),
    )
    daily = ev.groupBy("day", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wr = Window.partitionBy("day").orderBy(F.col("c").desc(), "ch")
    ranked = daily.select("day", "ch", F.row_number().over(wr).alias("r"))
    a, b = ranked.alias("a"), ranked.alias("b")
    w = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.ch") != F.col("b.ch")),
        )
        .groupBy(F.col("a.ch").alias("ca"), F.col("b.ch").alias("cb"))
        .agg(
            F.sum(F.when(F.col("a.r") < F.col("b.r"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_above")
        )
    )
    rows = collect_nonempty(w, "kemeny pairwise matrix")
    n_days = ev.select("day").distinct().count()
    wmap = {(r["ca"], r["cb"]): int(r["n_above"]) for r in rows}
    types = sorted({k[0] for k in wmap} | {k[1] for k in wmap})
    best = None
    for perm in permutations(types):
        pos = {ch: i for i, ch in enumerate(perm)}
        agree = sum(
            n for (ca, cb), n in wmap.items() if pos[ca] < pos[cb]
        )
        disagree = sum(
            n for (ca, cb), n in wmap.items() if pos[ca] > pos[cb]
        )
        key = (-agree, perm)
        if best is None or key < best[0]:
            best = (key, perm, agree, disagree)
    _, perm, agree, disagree = best
    return spark.createDataFrame(
        [(">".join(perm), agree, disagree, n_days)],
        "kemeny_order string, agreements long, disagreements long,"
        " n_days long",
    )
