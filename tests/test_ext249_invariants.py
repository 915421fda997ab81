"""Definition-level invariants for ext249: the rotating-calipers law
(calipers max == brute all-pairs max, via hull-vertex sufficiency)
fuzzed on random point sets, and the discrete power-law estimator's
consistency on planted Zipf samples."""

from __future__ import annotations

import math
import random

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext242 import (
    convex_hull_integer,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext249 import (
    calipers_diameter,
)


def test_calipers_equals_brute_diameter_fuzz():
    rng = random.Random(101)
    for _ in range(60):
        pts = [
            (rng.randint(-900, 900), rng.randint(-900, 900))
            for _ in range(rng.randint(3, 150))
        ]
        lower, upper = convex_hull_integer(pts)
        ring = lower + upper
        d2, _, _ = calipers_diameter(ring)
        brute = max(
            (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            for i, a in enumerate(pts)
            for b in pts[i + 1 :]
        )
        assert d2 == brute, (pts[:8], d2, brute)


def test_diameter_endpoints_are_hull_vertices():
    rng = random.Random(103)
    pts = [(rng.randint(0, 500), rng.randint(0, 500)) for _ in range(200)]
    lower, upper = convex_hull_integer(pts)
    ring = set(lower + upper)
    best = max(
        ((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2, a, b)
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
    )
    assert best[1] in ring and best[2] in ring


def test_hill_estimator_recovers_planted_alpha():
    """Discrete Zipf samples with exponent a: the dmin=2 Hill/Clauset
    closed form recovers a within a coarse band (it is consistent,
    not unbiased at small n)."""
    rng = random.Random(107)
    for a_true in (2.0, 2.8):
        # inverse-CDF sample from a truncated discrete power law
        support = list(range(2, 2000))
        weights = [d ** (-a_true) for d in support]
        tot = sum(weights)
        cum = []
        c = 0.0
        for w in weights:
            c += w / tot
            cum.append(c)
        xs = []
        for _ in range(20000):
            u = rng.random()
            lo, hi = 0, len(cum) - 1
            while lo < hi:
                mid = (lo + hi) // 2
                if cum[mid] < u:
                    lo = mid + 1
                else:
                    hi = mid
            xs.append(support[lo])
        n = len(xs)
        s = sum(math.log(x / 1.5) for x in xs)
        alpha_hat = 1 + n / s
        assert abs(alpha_hat - a_true) < 0.25, (a_true, alpha_hat)
