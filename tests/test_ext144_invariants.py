"""ext144: the streaming Holt fold re-derived as a plain sequential
Python loop over each user's in-order purchases (which is ALSO the
batch-split-invariance witness: the streamed 4-batch fold must equal
the single full fold bit-for-bit), and the SES grid against a loop."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext144 import (
    _HA,
    _HB,
    q_ses_alpha_scan,
    q_streaming_holt_replay,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)


def _holt_fold(ys, a=_HA, b=_HB, state=None):
    if state is None:
        l, t = ys[0], 0.0
        rest = ys[1:]
    else:
        l, t = state
        rest = ys
    for y in rest:
        nl = a * y + (1 - a) * (l + t)
        t = b * (nl - l) + (1 - b) * t
        l = nl
    return l, t


def test_streaming_holt_matches_full_fold(spark, sf_dir):
    got = {
        r["user_id"]: r for r in q_streaming_holt_replay(spark, sf_dir).collect()
    }
    ev = (
        convert_event_ts(read_table(spark, sf_dir, "events"))
        .where("event_type = 'purchase'")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r["user_id"]].append(
            (int(r["ts"].timestamp() * 1e6), r["event_id"], float(r["value"]))
        )
    assert set(got) == set(per)
    for u, lst in per.items():
        lst.sort()
        ys = [y for _, _, y in lst]
        l, t = _holt_fold(ys)
        row = got[u]
        assert row["n_purchases"] == len(ys)
        assert row["level_value"] == pytest.approx(l, abs=1e-6)
        assert row["trend_per_purchase"] == pytest.approx(t, abs=1e-6)


def test_holt_fold_is_batch_split_invariant():
    # the carried-recursion property the streaming fold relies on:
    # folding segments with carried state == folding the whole list
    ys = [float((7 * i) % 23 + 0.5) for i in range(40)]
    full = _holt_fold(ys)
    state = _holt_fold(ys[:11])
    state = _holt_fold(ys[11:25], state=state)
    state = _holt_fold(ys[25:], state=state)
    assert state == full  # bit-for-bit, not approx


def test_ses_alpha_scan_matches_loop(spark, sf_dir):
    rows = {r["alpha"]: r for r in q_ses_alpha_scan(spark, sf_dir).collect()}
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    import datetime

    per = {r[0]: round(r[1] * 100) for r in daily}
    days = sorted(per)
    cut = days[-1] - datetime.timedelta(days=56)
    ys = [float(per[d]) for d in days if d > cut]
    assert set(rows) == {round(0.1 * k, 1) for k in range(1, 10)}
    for a in rows:
        s, sse = ys[0], 0.0
        for y in ys[1:]:
            sse += (y - s) ** 2
            s = a * y + (1 - a) * s
        rmse = math.sqrt(sse / (len(ys) - 1)) / 100
        assert rows[a]["rmse_1step_dollars"] == pytest.approx(rmse, abs=0.02)
