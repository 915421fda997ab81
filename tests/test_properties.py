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


# ---------------------------------------------------------------------------
# Round-6 pure-python cores: GIF LZW roundtrip, EWMA batch-split
# invariance (the property behind streaming_ewma_replay).
# ---------------------------------------------------------------------------
@given(data=st.binary(min_size=0, max_size=2000))
@settings(max_examples=150, deadline=None)
def test_lzw_roundtrip_arbitrary_bytes(data):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    assert _lzw_decompress(_lzw_compress(data)) == data


@given(
    xs=st.lists(
        st.floats(min_value=0.01, max_value=1000, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=5),
)
@settings(max_examples=200, deadline=None)
def test_ewma_closed_form_fold_is_batch_split_invariant(xs, cuts):
    """Slicing the sequence anywhere and advancing the state with the
    closed-form per-slice fold (r^m * s + sum a x_j r^(m-j)) equals the
    plain sequential recursion -- the invariant that makes
    streaming_ewma_replay's carried state well-defined for ANY trigger
    timing."""
    a, r = 0.2, 0.8
    seq = xs[0]
    for x in xs[1:]:
        seq = a * x + (1 - a) * seq

    bounds = sorted({0, len(xs), *[c % (len(xs) + 1) for c in cuts]})
    s = None
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = xs[lo:hi]
        if not chunk:
            continue
        m = len(chunk)
        if s is None:
            s = chunk[0] * r ** (m - 1) + sum(
                a * x * r ** (m - 2 - j) for j, x in enumerate(chunk[1:], start=0)
            )
        else:
            s = r**m * s + sum(
                a * x * r ** (m - 1 - j) for j, x in enumerate(chunk)
            )
    assert s == pytest_approx(seq)


def pytest_approx(v):
    import pytest

    return pytest.approx(v, rel=1e-9, abs=1e-9)
