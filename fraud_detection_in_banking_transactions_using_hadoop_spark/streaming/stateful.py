"""Exact per-card stateful scoring (SURVEY.md 2.9 T4 + 2.10) via
applyInPandasWithState.

The reference mutates per-card state (last postcode + timestamp, advanced
only by GENUINE events) in HBase, record-at-a-time, with an intra-batch
race between same-card events (FinFraudGuard.java:71,86;
HBaseTransLink.java:76-81). We implement the deterministic refinement the
survey specifies: within each micro-batch, a card's events are sorted by
event time and folded sequentially -- each event observes the state left by
the previous one, including same-batch GENUINE updates (read-your-writes).

This is the one operator where imperative per-key logic is genuinely
required, so it is the engine's template for the Arrow-batched slow path:
groupBy(card_id).applyInPandasWithState, state one tiny row per card in the
state store (RocksDB on a real cluster). The hot path stays vectorized up
to the group boundary; the per-group fold is O(events-per-card-per-batch),
which stays tiny regardless of total scale because the shuffle spreads
cards across executors.

UCL/score are read-only during a stream run (the batch layer refreshes
them, README.md:244,282) and ride in as broadcast dicts; per-card geo
state is the mutable part.
"""

from __future__ import annotations

import math
from datetime import datetime
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fraud_detection_in_banking_transactions_using_hadoop_spark.config import DEFAULT_CONFIG, EngineConfig
from fraud_detection_in_banking_transactions_using_hadoop_spark.functions.scalar import EARTH_RADIUS_KM

OUTPUT_SCHEMA = T.StructType([
    T.StructField("card_id", T.LongType()),
    T.StructField("member_id", T.LongType()),
    T.StructField("amount", T.DoubleType()),
    T.StructField("pos_id", T.LongType()),
    T.StructField("postcode", T.IntegerType()),
    T.StructField("transaction_dt", T.StringType()),
    T.StructField("status", T.StringType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("last_postcode", T.IntegerType()),
    T.StructField("last_ts", T.StringType()),
])

_PY_FORMATS = ("%Y-%m-%d %H:%M:%S", "%d-%m-%Y %H:%M:%S")


def _parse_ts(s: str | None) -> datetime | None:
    if s is None:
        return None
    for fmt in _PY_FORMATS:
        try:
            return datetime.strptime(s, fmt)
        except (ValueError, TypeError):
            continue
    return None


def law_of_cosines_km(lat1, lon1, lat2, lon2) -> float:
    """Python twin of functions.scalar.distance_km (FraudDistMetric.java:69-78)."""
    if lat1 == lat2 and lon1 == lon2:
        return 0.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    x = math.sin(p1) * math.sin(p2) + math.cos(p1) * math.cos(p2) * math.cos(
        math.radians(lon1) - math.radians(lon2)
    )
    return math.acos(max(-1.0, min(1.0, x))) * EARTH_RADIUS_KM


def fold_events(
    events: list[dict[str, Any]],
    state: tuple[int | None, str | None],
    lookup: dict[int, tuple],
    geo: dict[str, tuple],
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[list[str], tuple[int | None, str | None]]:
    """Sequential read-your-writes fold for ONE card's batch (SURVEY.md
    2.10). Pure Python so the streaming operator and the test oracle share
    one implementation. Returns (statuses, new_state).

    `events` must already be sorted by event time; `state` is
    (last_postcode, last_ts); `lookup[card_id] = (ucl, score)`.
    """
    last_postcode, last_ts = state
    statuses: list[str] = []
    for ev in events:
        ucl_score = lookup.get(ev["card_id"])
        ucl, score = ucl_score if ucl_score else (None, None)

        rule_score = score is not None and score < cfg.score_threshold
        rule_amount = ucl is not None and ev["amount"] is not None and ev["amount"] > ucl

        rule_speed = False
        cur_ts = _parse_ts(ev["transaction_dt"])
        prev_ts = _parse_ts(last_ts)
        if cur_ts is not None and prev_ts is not None:
            dt = (cur_ts - prev_ts).total_seconds()
            cur_geo = geo.get(str(ev["postcode"])) if ev["postcode"] is not None else None
            prev_geo = geo.get(str(last_postcode)) if last_postcode is not None else None
            if dt <= 0:
                rule_speed = cfg.nonpositive_dt_is_fraud
            elif cur_geo and prev_geo:
                dist = law_of_cosines_km(cur_geo[0], cur_geo[1], prev_geo[0], prev_geo[1])
                rule_speed = dist / dt > cfg.speed_threshold_kms

        status = cfg.status_fraud if (rule_score or rule_amount or rule_speed) else cfg.status_genuine
        statuses.append(status)
        if status == cfg.status_genuine:
            last_postcode, last_ts = ev["postcode"], ev["transaction_dt"]
    return statuses, (last_postcode, last_ts)


def score_stream_stateful(
    stream: DataFrame,
    lookup_bc,
    geo_bc,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Stateful streaming scorer: groupBy(card_id) + applyInPandasWithState.

    lookup_bc: Broadcast[dict[card_id, (ucl, score)]]
    geo_bc:    Broadcast[dict[zip_str, (lat, lon)]]

    Scale note: broadcasting the (ucl, score) dimension assumes the card
    dimension fits in executor memory (it is one small row per card; the
    reference holds the same data as an HBase table + in-JVM geo map). For
    a card dimension beyond memory, seed the state store instead via a
    bootstrap union of lookup rows sorted before all events.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last_postcode, last_ts) = state.get if state.exists else (None, None)
        lookup = lookup_bc.value
        geo = geo_bc.value
        for pdf in pdfs:
            # Sort by PARSED event time (lexicographic order breaks for the
            # dd-MM-yyyy input format), tiebreak pos_id; stable sort keeps
            # arrival order for full ties.
            pdf = (
                pdf.assign(_ts=pdf["transaction_dt"].map(_parse_ts))
                .sort_values(["_ts", "pos_id"], kind="mergesort")
                .drop(columns="_ts")
                .reset_index(drop=True)
            )
            events = pdf.to_dict("records")
            statuses, (last_postcode, last_ts) = fold_events(
                events, (last_postcode, last_ts), lookup, geo, cfg
            )
            pdf["status"] = statuses
            yield pdf[[f.name for f in OUTPUT_SCHEMA.fields]]
        state.update((last_postcode, last_ts))

    return stream.groupBy("card_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
