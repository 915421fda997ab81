"""Extension batch 149 (round 6): the Burrows-Wheeler compressibility
gain (a REAL string-algorithm operator: full BWT per document,
expressed relationally as a circular-rotation sort -- the text twin of
the LZW/zlib codec tier, and the principled upgrade over
rle_compressibility's raw run counting), the Hawkes branching-ratio
estimate from the Fano factor of minute-binned arrivals (how much of
the event stream is self-excited contagion vs exogenous -- the burst
diagnostic behind fraud-wave monitors), and the winsorized Pearson
correlation (tail-robust association between daily order count and
daily revenue).

Cross-engine discipline:
- BWT: rotations are substr(text || text, i+1, n); both engines sort
  them under BINARY collation (lowercase ASCII + space), tie-broken by
  the rotation index (equal rotations have equal last chars, so ties
  cannot change the BWT string); run counts are exact integers.
- Hawkes/Fano: minute bins are exact integer epoch-minutes; empty bins
  enter through the closed-form bin count, so the variance uses the
  full timeline, not just occupied minutes.
- winsorized_corr: clamp bounds are exact order statistics off the
  value spines; clamped values stay integers, so all five correlation
  moments are exact.

Scale notes: the rotation table is O(total corpus chars) rows with
PER-DOCUMENT windows only (never global); the Fano and correlation
passes are single aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


@register(
    "bwt_compressibility_gain",
    """
    WITH d AS (
      SELECT doc_id, source, text, length(text) AS n, text || text AS dd
      FROM documents WHERE length(text) >= 2),
    rot AS (
      SELECT doc_id, source, i,
             substr(dd, i + 1, n) AS r,
             substr(dd, i + n, 1) AS last_ch
      FROM d, (SELECT unnest(range(0, 600)) AS i) idx
      WHERE i < n),
    bwt AS (
      SELECT doc_id, source, last_ch,
             lag(last_ch) OVER (PARTITION BY doc_id ORDER BY r, i) AS prev_ch
      FROM rot),
    bruns AS (
      SELECT doc_id, source,
             CAST(sum(CASE WHEN prev_ch IS NULL OR prev_ch <> last_ch
                      THEN 1 ELSE 0 END) AS BIGINT) AS runs_bwt
      FROM bwt GROUP BY doc_id, source),
    rraw AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN prev_ch IS NULL OR prev_ch <> ch
                      THEN 1 ELSE 0 END) AS BIGINT) AS runs_raw
      FROM (
        SELECT doc_id, i, substr(text, i + 1, 1) AS ch,
               lag(substr(text, i + 1, 1)) OVER (
                 PARTITION BY doc_id ORDER BY i) AS prev_ch
        FROM d, (SELECT unnest(range(0, 600)) AS i) idx WHERE i < n)
      GROUP BY doc_id)
    SELECT b.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(r.runs_raw) AS BIGINT) AS total_runs_raw,
           CAST(sum(b.runs_bwt) AS BIGINT) AS total_runs_bwt,
           CAST(1000000 * sum(b.runs_bwt) // sum(r.runs_raw) AS BIGINT)
             AS bwt_run_ppm
    FROM bruns b JOIN rraw r ON b.doc_id = r.doc_id
    GROUP BY b.source
    ORDER BY b.source
    """,
    tags=("text", "compression", "algorithm"),
)
def q_bwt_compressibility_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Burrows-Wheeler run profile: each document's FULL
    BWT is built relationally (all n circular rotations via
    substr(text||text), sorted per document under binary collation;
    the BWT character is each rotation's last char), and the
    character-run counts of the BWT string are compared with the raw
    text's (bwt_run_ppm < 1e6 means BWT made the text more
    RLE-compressible -- the whole point of bzip2's first stage).
    r13 plan change: the relational rotation sort shuffles O(sum n^2)
    BYTES (every rotation row carries its full n-char string through
    the per-doc window sort -- ~1.5 GB of sort traffic at sf0.1, the
    sweep's heaviest Spark side). The BWT is a PER-DOCUMENT pure
    function, so the scale-correct plan is an embarrassingly parallel
    mapInPandas fold: no data-sized shuffle at all, only the tiny
    per-source aggregate moves. The DuckDB oracle keeps the relational
    rotation-sort formulation, so the hash gate now compares two
    INDEPENDENT constructions of the BWT (stronger than shared text).
    Sort parity: rotations are lowercase ASCII + space, so Python
    code-point order == BINARY collation; equal rotations share a last
    char, so the index tiebreak cannot change the BWT string."""
    import pandas as pd

    docs = (
        read_table(spark, sf_dir, "documents")
        .where(F.length("text") >= 2)
        .select("doc_id", "source", "text")
    )

    def _bwt_fold(batches):
        for pdf in batches:
            out = []
            for did, src, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                n = len(text)
                dd = text + text
                order = sorted(range(n), key=lambda i: dd[i : i + n])
                last = "".join(dd[i + n - 1] for i in order)
                runs_bwt = 1 + sum(
                    1 for j in range(1, n) if last[j] != last[j - 1]
                )
                runs_raw = 1 + sum(
                    1 for j in range(1, n) if text[j] != text[j - 1]
                )
                out.append((did, src, runs_bwt, runs_raw))
            yield pd.DataFrame(
                out, columns=["doc_id", "source", "runs_bwt", "runs_raw"]
            )

    j = docs.mapInPandas(
        _bwt_fold,
        "doc_id bigint, source string, runs_bwt bigint, runs_raw bigint",
    )
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("runs_raw").cast("bigint").alias("total_runs_raw"),
            F.sum("runs_bwt").cast("bigint").alias("total_runs_bwt"),
            F.expr(
                "CAST(1000000 * sum(runs_bwt) DIV sum(runs_raw) AS BIGINT)"
            ).alias("bwt_run_ppm"),
        )
        .orderBy("source")
    )


@register(
    "hawkes_branching_fano",
    """
    WITH m AS (
      SELECT CAST(epoch_us(ts) // 60000000 AS BIGINT) AS minute
      FROM events),
    bins AS (
      SELECT minute, CAST(count(*) AS BIGINT) AS k FROM m GROUP BY minute),
    span AS (
      SELECT CAST(max(minute) - min(minute) + 1 AS BIGINT) AS n_bins,
             CAST(count(*) AS BIGINT) AS n_occupied,
             CAST(sum(k) AS BIGINT) AS sk,
             CAST(sum(k * k) AS BIGINT) AS skk
      FROM bins)
    SELECT n_bins, n_occupied, sk AS n_events,
           round(CAST(sk AS DOUBLE) / n_bins, 6) AS mean_per_minute,
           round((CAST(skk AS DOUBLE) / n_bins
                  - (CAST(sk AS DOUBLE) / n_bins)
                    * (CAST(sk AS DOUBLE) / n_bins))
                 / (CAST(sk AS DOUBLE) / n_bins), 6) AS fano_factor,
           round(greatest(0.0, 1.0 - 1.0 / sqrt(
                 (CAST(skk AS DOUBLE) / n_bins
                  - (CAST(sk AS DOUBLE) / n_bins)
                    * (CAST(sk AS DOUBLE) / n_bins))
                 / (CAST(sk AS DOUBLE) / n_bins))), 6)
             AS hawkes_branching_ratio
    FROM span
    """,
    tags=("timeseries", "point-process", "fraud"),
)
def q_hawkes_branching_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hawkes self-excitation estimate from minute-binned arrivals:
    for a Hawkes process the count Fano factor obeys F -> 1/(1-n)^2,
    so n_hat = 1 - 1/sqrt(F) (clamped at 0; F <= 1 means no
    clustering beyond Poisson). Empty minutes enter via the closed
    timeline span, so the variance is over the true binned process.
    n_hat near 1 = arrivals are mostly contagion (the fraud-wave /
    retry-storm signature); near 0 = exogenous Poisson traffic."""
    events = read_table(spark, sf_dir, "events")
    m = events.select(
        F.expr("CAST(unix_micros(ts) DIV 60000000 AS BIGINT)").alias("minute")
    )
    bins = m.groupBy("minute").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    span = bins.agg(
        (F.max("minute") - F.min("minute") + 1).cast("bigint").alias("n_bins"),
        F.count(F.lit(1)).cast("bigint").alias("n_occupied"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
    )
    mean = F.col("sk").cast("double") / F.col("n_bins")
    fano = (F.col("skk").cast("double") / F.col("n_bins") - mean * mean) / mean
    return span.select(
        "n_bins",
        "n_occupied",
        F.col("sk").alias("n_events"),
        F.round(mean, 6).alias("mean_per_minute"),
        F.round(fano, 6).alias("fano_factor"),
        F.round(F.greatest(F.lit(0.0), 1.0 - 1.0 / F.sqrt(fano)), 6).alias(
            "hawkes_branching_ratio"
        ),
    )


@register(
    "winsorized_corr",
    """
    WITH daily AS (
      SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderdate),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    kcuts AS (
      SELECT min(CASE WHEN 20 * cc >= n THEN k END) AS lo,
             min(CASE WHEN 20 * cc >= 19 * n THEN k END) AS hi
      FROM (SELECT k, sum(cnt) OVER (ORDER BY k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc, n
            FROM (SELECT k, CAST(count(*) AS BIGINT) AS cnt
                  FROM daily GROUP BY k) s CROSS JOIN nn)),
    ccuts AS (
      SELECT min(CASE WHEN 20 * cc >= n THEN cents END) AS lo,
             min(CASE WHEN 20 * cc >= 19 * n THEN cents END) AS hi
      FROM (SELECT cents, sum(cnt) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc, n
            FROM (SELECT cents, CAST(count(*) AS BIGINT) AS cnt
                  FROM daily GROUP BY cents) s CROSS JOIN nn)),
    w AS (
      SELECT least(greatest(d.k, kc.lo), kc.hi) AS x,
             least(greatest(d.cents, cc2.lo), cc2.hi) AS y
      FROM daily d CROSS JOIN kcuts kc CROSS JOIN ccuts cc2),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM w)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) + 0.0
             AS winsorized_pearson
    FROM mom
    """,
    tags=("stats", "robust", "correlation"),
)
def q_winsorized_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between daily order COUNT and daily REVENUE
    after 5%-per-tail winsorization of both series: clamp bounds are
    exact order statistics (min value with 20*cum >= n / >= 19n) off
    each value spine, clamped values stay integers, and the five
    correlation moments accumulate exactly -- a spike day can no
    longer manufacture (or destroy) the association."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    nn = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    def cuts(col: str):
        spine = daily.groupBy(col).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        pre = spine.select(col, F.sum("cnt").over(w).alias("cc")).crossJoin(
            F.broadcast(nn)
        )
        return pre.agg(
            F.min(F.when(20 * F.col("cc") >= F.col("n"), F.col(col))).alias(
                "lo"
            ),
            F.min(
                F.when(20 * F.col("cc") >= 19 * F.col("n"), F.col(col))
            ).alias("hi"),
        )
    kc = cuts("k").select(F.col("lo").alias("klo"), F.col("hi").alias("khi"))
    cc = cuts("cents").select(
        F.col("lo").alias("clo"), F.col("hi").alias("chi")
    )
    w = (
        daily.crossJoin(F.broadcast(kc))
        .crossJoin(F.broadcast(cc))
        .select(
            F.least(F.greatest(F.col("k"), F.col("klo")), F.col("khi"))
            .cast(_DEC)
            .alias("x"),
            F.least(F.greatest(F.col("cents"), F.col("clo")), F.col("chi"))
            .cast(_DEC)
            .alias("y"),
        )
    )
    mom = w.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(_DEC).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(_DEC).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(_DEC).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return mom.select(
        F.col("n").cast("bigint").alias("n_days"),
        (F.round(num / den, 6) + F.lit(0.0)).alias("winsorized_pearson"),
    )
