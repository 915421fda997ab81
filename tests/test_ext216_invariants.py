"""DGIM invariants (ext216): the canonical bucket-structure laws, the
seeded-fold batch-cut equivalence the streaming replay relies on, the
50%-error guarantee on adversarial planted streams, and batch==replay
both-path parity."""

from __future__ import annotations

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext216 import (
    _WIN,
    dgim_estimate,
    dgim_fold,
)

_Q = {q.name: q.fn for q in registry()}


def _structure_ok(st):
    from collections import Counter

    sizes = Counter(sz for _, sz in st)
    assert all(c <= 2 for c in sizes.values()), f"3+ buckets of a size: {st}"
    assert all(sz & (sz - 1) == 0 for sz in sizes), f"non-power size: {st}"
    # timestamps unique; older buckets never smaller than newer ones
    ts = [t for t, _ in st]
    assert len(set(ts)) == len(ts)
    by_t = [sz for _, sz in sorted(st)]
    for a, b in zip(by_t, by_t[1:]):
        assert a >= b, f"older bucket smaller than newer: {sorted(st)}"


def test_bucket_structure_laws():
    streams = [
        [1] * 200,
        [1, 0] * 150,
        [0] * 50 + [1] * 100 + [0] * 50,
        [1, 1, 0, 1, 0, 0, 1] * 40,
    ]
    for bits in streams:
        st, n = dgim_fold(bits)
        assert n == len(bits)
        _structure_ok(st)
        assert sum(sz for _, sz in st) == sum(bits)  # sizes partition ones


def test_batch_cut_equivalence():
    bits = [1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 1] * 37
    whole, n = dgim_fold(bits)
    for cut in (1, 7, 100, 250, len(bits) - 1):
        st1, n1 = dgim_fold(bits[:cut])
        st2, n2 = dgim_fold(bits[cut:], state=st1, offset=n1)
        assert n2 == n
        assert sorted(st2) == sorted(whole), f"cut at {cut} diverged"


def test_error_guarantee_on_adversarial_streams():
    streams = [
        [1] * 500,
        [0] * 400 + [1] * 100,
        [1] * 100 + [0] * 400,
        [1, 0, 0, 0] * 125,
        [1, 1, 1, 0] * 125,
    ]
    for bits in streams:
        st, n = dgim_fold(bits)
        est, bound, _ = dgim_estimate(st, n, _WIN)
        true = sum(bits[max(0, n - _WIN):])
        assert abs(est - true) <= bound, (bits[:8], est, true, bound)
        # and the bound is itself <= half the window's ones (50% claim)
        if true:
            assert bound <= max(true, 1)


def test_replay_equals_batch(spark, sf_dir):
    batch = sorted(
        map(tuple, _Q["dgim_error_window_daily"](spark, sf_dir).collect())
    )
    replay = sorted(
        map(tuple, _Q["streaming_dgim_replay"](spark, sf_dir).collect())
    )
    assert batch == replay
    assert all(r[-1] == 1 for r in batch)  # within_bound everywhere


def _closed_form(positions):
    """The round-11 oracle's bijective-base-2 construction, in Python:
    after m in-order one-bit insertions the per-size bucket counts are
    the unique digits d_i in {1,2} with m = sum d_i 2^i, buckets
    partition the ones into consecutive runs (newest runs smallest),
    and each bucket is stamped with its newest one's position."""
    m = len(positions)
    out, mm, i, c = [], m, 0, 0
    digits = []
    while mm > 0:
        d = ((mm - 1) % 2) + 1
        digits.append(d)
        mm = (mm - d) // 2
    for i, d in enumerate(digits):
        sz = 1 << i
        for _ in range(d):
            out.append((positions[m - c - 1], sz))
            c += sz
    return out


def test_closed_form_equals_merge_recursion():
    """The numeration theorem the SQL oracle now relies on, fuzzed
    against the real merge recursion: 3000 random streams across
    sparse/balanced/dense regimes, exact bucket-list equality."""
    import random

    rng = random.Random(7)
    for _ in range(3000):
        n = rng.randint(0, 400)
        p = rng.choice([0.02, 0.3, 0.9])
        bits = [1 if rng.random() < p else 0 for _ in range(n)]
        st, _ = dgim_fold(bits)
        positions = [i + 1 for i, b in enumerate(bits) if b]
        assert sorted(st) == sorted(_closed_form(positions))


def test_closed_form_exhaustive_small_m():
    """Exhaustive (not sampled) check for every m in 1..256 on the
    all-ones stream: digit counts, consecutive-run coverage, stamps."""
    for m in range(1, 257):
        st, _ = dgim_fold([1] * m)
        cf = _closed_form(list(range(1, m + 1)))
        assert sorted(st) == sorted(cf), m
        assert sum(sz for _, sz in cf) == m
