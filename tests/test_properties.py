"""Property-based tests (hypothesis) for the pure-Python pieces shared
with Spark operators: the stateful fold and the distance function.

The key invariant: folding a card's event sequence is BATCH-SPLIT
INVARIANT -- slicing the same ordered events into arbitrary micro-batches
(carrying state across slices) produces identical statuses and final
state. This is exactly what makes the streaming operator's semantics
well-defined regardless of trigger timing.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.stateful import (
    fold_events,
    law_of_cosines_km,
)

GEO = {
    "100": (40.7128, -74.0060),
    "200": (34.0522, -118.2437),
    "300": (51.5074, -0.1278),
}
LOOKUP = {1: (100.0, 500)}


@st.composite
def event_sequences(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    t0 = datetime(2024, 1, 1, 8, 0, 0)
    events = []
    t = t0
    for i in range(n):
        t = t + timedelta(seconds=draw(st.integers(min_value=0, max_value=90000)))
        events.append(
            {
                "card_id": 1,
                "member_id": 1,
                "amount": draw(st.floats(min_value=1, max_value=300, allow_nan=False)),
                "pos_id": i,
                "postcode": draw(st.sampled_from([100, 200, 300, 999])),
                "transaction_dt": t.strftime("%Y-%m-%d %H:%M:%S"),
            }
        )
    return events


@given(events=event_sequences(), data=st.data())
@settings(max_examples=200, deadline=None)
def test_fold_is_batch_split_invariant(events, data):
    whole_statuses, whole_state = fold_events(events, (None, None), LOOKUP, GEO)

    # random partition of the same sequence into consecutive slices
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(events)), max_size=4, unique=True
            )
        )
    )
    bounds = [0, *cuts, len(events)]
    statuses, state = [], (None, None)
    for lo, hi in zip(bounds, bounds[1:]):
        s, state = fold_events(events[lo:hi], state, LOOKUP, GEO)
        statuses.extend(s)

    assert statuses == whole_statuses
    assert state == whole_state


@given(events=event_sequences())
@settings(max_examples=200, deadline=None)
def test_fold_state_only_advances_on_genuine(events):
    statuses, (pc, ts) = fold_events(events, (None, None), LOOKUP, GEO)
    genuine = [e for e, s in zip(events, statuses) if s == "GENUINE"]
    if genuine:
        assert (pc, ts) == (genuine[-1]["postcode"], genuine[-1]["transaction_dt"])
    else:
        assert (pc, ts) == (None, None)


@given(
    lat1=st.floats(min_value=-89, max_value=89),
    lon1=st.floats(min_value=-179, max_value=179),
    lat2=st.floats(min_value=-89, max_value=89),
    lon2=st.floats(min_value=-179, max_value=179),
)
@settings(max_examples=500, deadline=None)
def test_distance_symmetric_nonnegative_bounded(lat1, lon1, lat2, lon2):
    d = law_of_cosines_km(lat1, lon1, lat2, lon2)
    assert d == law_of_cosines_km(lat2, lon2, lat1, lon1)  # exact symmetry
    assert 0.0 <= d <= math.pi * 6371.0 + 1e-6  # half circumference bound
    assert law_of_cosines_km(lat1, lon1, lat1, lon1) == 0.0
