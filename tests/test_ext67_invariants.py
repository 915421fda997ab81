"""Definition-level checks for the ext67 streaming folds: the merge
operations the foreachBatch state relies on must be exactly mergeable,
proven here as pure-python properties (the live-vs-batch parity itself
is what the DuckDB oracle hash-checks)."""

from __future__ import annotations

import hashlib
import math


def _aes_key(event_id: int, value: float) -> float:
    u = (int(hashlib.md5(str(event_id).encode()).hexdigest()[:8], 16) + 1.0) / 4294967297.0
    return -math.log(u) / max(value, 0.01)


def test_reservoir_merge_is_partition_invariant():
    # k-smallest of a union == k-smallest of (k-smallest per part) union
    rows = [(i, (i * 37 % 97) + 0.5) for i in range(1, 500)]
    k = 25
    keys = sorted((_aes_key(i, v), i) for i, v in rows)
    direct = [i for _, i in keys[:k]]
    for n_parts in (1, 3, 4, 7):
        parts = [rows[p::n_parts] for p in range(n_parts)]
        state: list = []
        for part in parts:
            cand = sorted((_aes_key(i, v), i) for i, v in part)[:k]
            state = sorted(state + cand)[:k]
        assert [i for _, i in state] == direct, n_parts


def test_daily_histogram_merge_is_partition_invariant():
    rows = [(d % 30, (d * 13) % 1000) for d in range(5000)]
    direct: dict = {}
    for d, c in rows:
        direct[d] = direct.get(d, 0) + c
    for n_parts in (2, 4, 5):
        merged: dict = {}
        for p in range(n_parts):
            part: dict = {}
            for d, c in rows[p::n_parts]:
                part[d] = part.get(d, 0) + c
            for d, c in part.items():
                merged[d] = merged.get(d, 0) + c
        assert merged == direct
