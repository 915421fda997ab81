"""Definition-level invariants for ext244 (cache replay): Belady
dominance over LRU (and over FIFO) on fuzzed traces, exact hit counts
on crafted traces, and the next-use convention."""

from __future__ import annotations

import random

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext244 import (
    _BIG,
    belady_fold,
    lru_fold,
)


def _nextuse(pages):
    nxt = [_BIG] * len(pages)
    last: dict[int, int] = {}
    for i in range(len(pages) - 1, -1, -1):
        nxt[i] = last.get(pages[i], _BIG)
        last[pages[i]] = i + 1  # 1-based positions, matching the SQL rn
    return nxt


def test_belady_dominates_lru_fuzz():
    rng = random.Random(61)
    for _ in range(60):
        n = rng.randint(10, 600)
        k = rng.choice([4, 10, 40])
        pages = [rng.randrange(k) for _ in range(n)]
        c = rng.choice([2, 4, 8])
        lh = lru_fold(pages, c)
        bh = belady_fold(pages, _nextuse(pages), c)
        assert bh >= lh, (pages[:20], c, lh, bh)


def test_exact_counts_on_crafted_traces():
    # all within cache: everything after first touch hits
    pages = [1, 2, 3, 1, 2, 3, 1, 2, 3]
    assert lru_fold(pages, 4) == 6
    assert belady_fold(pages, _nextuse(pages), 4) == 6
    # classic LRU pathological loop: cycle of C+1 pages -> LRU never
    # hits, Belady keeps C-1 of them
    loop = [1, 2, 3, 4, 5] * 4
    assert lru_fold(loop, 4) == 0
    assert belady_fold(loop, _nextuse(loop), 4) > 0


def test_cold_misses_are_mandatory():
    """Neither policy can hit a first access: hits <= n - distinct."""
    rng = random.Random(67)
    for _ in range(20):
        pages = [rng.randrange(12) for _ in range(200)]
        bound = len(pages) - len(set(pages))
        assert lru_fold(pages, 8) <= bound
        assert belady_fold(pages, _nextuse(pages), 8) <= bound


def test_full_cache_never_evicts_upcoming():
    """Belady with cache >= working set achieves the cold-miss bound."""
    rng = random.Random(71)
    pages = [rng.randrange(6) for _ in range(300)]
    assert belady_fold(pages, _nextuse(pages), 8) == len(pages) - len(
        set(pages)
    )
