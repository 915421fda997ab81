"""Definition-level invariants for ext247: the seeded LRU fold's
batch-cut equivalence (the property replay #34 relies on) and the
hull-vertex-state incremental law."""

from __future__ import annotations

import random

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext242 import (
    convex_hull_integer,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext244 import lru_fold


def _lru_seeded(pages, cache, hits, c=8):
    cache = list(cache)
    for p in pages:
        if p in cache:
            hits += 1
            cache.remove(p)
            cache.insert(0, p)
        else:
            cache.insert(0, p)
            if len(cache) > c:
                cache.pop()
    return cache, hits


def test_lru_batch_cut_equivalence():
    """Folding [0:cut] then resuming with the carried recency list
    equals the one-shot fold at EVERY cut -- order of the carried
    list is load-bearing (a sorted carry would diverge)."""
    rng = random.Random(89)
    for _ in range(20):
        pages = [rng.randrange(12) for _ in range(rng.randint(5, 200))]
        whole = lru_fold(pages)
        for cut in {1, len(pages) // 3, len(pages) // 2, len(pages) - 1}:
            c1, h1 = _lru_seeded(pages[:cut], [], 0)
            _, h2 = _lru_seeded(pages[cut:], c1, h1)
            assert h2 == whole


def test_lru_shuffled_carry_diverges():
    """Negative control: destroying the carried ORDER changes the
    result on a crafted trace -- proving the state shape is new
    (sets/dicts/sums would not have caught a wrong carry)."""
    # after [1..9] the cache is [9..2]; a miss (10) evicts the true
    # tail 2, but the reversed carry evicts 9 instead -- the following
    # access to 2 then hits only under the corrupted carry
    pages = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 2]
    cut = 9
    c1, h1 = _lru_seeded(pages[:cut], [], 0)
    _, good = _lru_seeded(pages[cut:], c1, h1)
    _, bad = _lru_seeded(pages[cut:], list(reversed(c1)), h1)
    assert good != bad


def _ring(points):
    lower, upper = convex_hull_integer(points)
    return lower + upper


def test_incremental_hull_equals_full():
    """Hull-vertex state + delta re-hull == one-shot hull, across
    random 3-snapshot splits (the O(|hull|) state law)."""
    rng = random.Random(97)
    for _ in range(25):
        pts = [
            (rng.randint(-500, 500), rng.randint(-500, 500))
            for _ in range(rng.randint(6, 120))
        ]
        snaps = [pts[i::3] for i in range(3)]
        state: list = []
        for delta in snaps:
            state = _ring(state + delta)
        assert set(_ring(state)) == set(_ring(pts))
