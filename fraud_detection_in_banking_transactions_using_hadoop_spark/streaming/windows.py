"""Event-time windowed aggregation + streaming dedup.

The reference has NO watermarks, event-time windows, or dedup (SURVEY.md
2.9 'absent'); out-of-order events silently produce negative dt. These are
engine features Structured Streaming provides nearly free, with the
reference's no-watermark behavior as the default elsewhere.

Scale: windowed aggregation state is (keys x open windows) rows in the
state store; the watermark bounds 'open windows', which is what makes the
operator runnable forever. dropDuplicates state is likewise bounded only
if a watermark is set -- unbounded dedup on an infinite stream is a leak,
so `dedup_stream` requires one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str | None = "10 minutes",
    keys: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if `slide` differs from `window`) event-time
    counts per key, tolerating late data up to the watermark.

    watermark=None means an upstream operator (e.g. dedup_stream) already
    set one -- redefining a watermark kills the query at runtime.
    """
    w = stream.withWatermark(ts_col, watermark) if watermark else stream
    grouping = [F.window(F.col(ts_col), window, slide or window), *keys]
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total"))
    out = w.groupBy(*grouping).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[c for c in ("n", "total") if c in out.columns],
    )


def session_windows(
    stream: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str | None = "10 minutes",
    keys: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Native streaming sessionization: `session_window(ts, gap)` merges
    events separated by less than `gap` into one session per key (the
    streaming twin of the batch lag+cumsum sessionize query). Sessions
    close -- and emit, in append mode -- once the watermark passes the
    session end."""
    w = stream.withWatermark(ts_col, watermark) if watermark else stream
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total"))
    out = w.groupBy(F.session_window(F.col(ts_col), gap), *keys).agg(*aggs)
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys,
        *[c for c in ("n", "total") if c in out.columns],
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    max_lag: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a time-range condition:
    match right rows arriving within [left_ts, left_ts + max_lag] -- e.g.
    correlate an auth-request stream with its settlement stream.

    Both sides MUST carry watermarks and the join MUST have a time bound:
    that pair is what lets the state store evict buffered rows once the
    other side's watermark passes the range, keeping state proportional to
    (rate x lag horizon), not the stream prefix -- the only shape that
    runs forever at 100 TB rates. Outer variants ('leftOuter', ...) emit
    NULL-padded rows only after watermark expiry proves no match can
    arrive.

    Returns columns: key, left.* (minus key/ts), both ts columns.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_lag}"))
    )
    joined = lw.join(rw, cond, how)
    # drop the duplicated key column from the right side
    return joined.drop(rw[key])


def dedup_stream(
    stream: DataFrame,
    ts_col: str,
    id_cols: Sequence[str],
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-id event stream: drops replays/duplicates of the
    id columns arriving within the watermark horizon. State is purged past
    the watermark, so memory is bounded by (arrival rate x horizon).
    watermark=None: one was already set upstream (never redefine)."""
    w = stream.withWatermark(ts_col, watermark) if watermark else stream
    return w.dropDuplicates([*id_cols, ts_col])


def dedup_stream_within_watermark(
    stream: DataFrame,
    ts_col: str,
    id_cols: Sequence[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """dropDuplicatesWithinWatermark variant of dedup_stream: dedups on
    the id columns ALONE (no event-time in the key), guaranteeing
    dedup for duplicates arriving within the watermark delay of each
    other even when their timestamps differ -- the semantics that match
    at-least-once sources (a Kafka replay carries a new ingest ts, so
    keying on [id, ts] as dedup_stream does would keep both copies).
    State for an id is evictable once the watermark passes its first
    sighting + delay, so memory stays (arrival rate x horizon)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
