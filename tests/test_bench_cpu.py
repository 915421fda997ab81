"""bench.py CPU-sampler contract (r9 verdict item 3): per-pid deltas
are clamped at >= 0, so a worker that dies and reparents to init
between samples (vanishing from the descendant walk with its lifetime
CPU) produces a bounded UNDERCOUNT, never a negative per-query CPU
(the r9 driver capture showed bpe_merge_training: -8.68 CPU-s)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _cpu_delta, _tree_cpu_stats


def test_cpu_delta_disappearing_pid_never_negative():
    # pid 2 burned 8 CPU-s then died and reparented to init between
    # samples: it is absent from `live`. The old whole-tree scalar
    # subtraction would report (7) - (5 + 8) = -6; the per-pid clamp
    # reports pid 1's progress only.
    prev = {1: 5.0, 2: 8.0}
    live = {1: 7.0}
    assert _cpu_delta(prev, live) == 2.0


def test_cpu_delta_new_pid_counts_fully():
    # A worker spawned mid-query has no prev entry: its whole lifetime
    # CPU belongs to this window.
    assert _cpu_delta({1: 5.0}, {1: 5.5, 3: 2.0}) == 2.5


def test_cpu_delta_pid_reuse_clamped():
    # A reused pid can reappear with LESS CPU than the dead process it
    # replaced; the clamp keeps that term at 0 instead of negative.
    assert _cpu_delta({1: 5.0, 2: 100.0}, {1: 6.0, 2: 1.0}) == 1.0


def test_cpu_delta_empty_live():
    assert _cpu_delta({1: 5.0}, {}) == 0.0


def test_tree_cpu_stats_includes_self_and_is_positive():
    stats = _tree_cpu_stats()
    import os

    assert os.getpid() in stats
    assert all(v >= 0.0 for v in stats.values())
