"""Definition-level invariants for ext242 (convex hull): hull laws on
planted and fuzzed integer point sets -- containment, extreme-point
membership, CCW orientation, idempotence, and the distributed
hull-of-union == hull-of-part-hulls law (the 100 TB path)."""

from __future__ import annotations

import random

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext242 import (
    convex_hull_integer,
)


def _ring(points):
    lower, upper = convex_hull_integer(points)
    return lower + upper


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _inside_or_on(ring, p):
    n = len(ring)
    return all(_cross(ring[i], ring[(i + 1) % n], p) >= 0 for i in range(n))


def test_square_with_interior_points():
    pts = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5), (3, 7), (10, 5)]
    ring = _ring(pts)
    assert set(ring) == {(0, 0), (10, 0), (10, 10), (0, 10)}
    # (10, 5) is ON the boundary: strict hull drops collinear points


def test_hull_contains_all_points_fuzz():
    rng = random.Random(31)
    for _ in range(40):
        pts = [
            (rng.randint(-1000, 1000), rng.randint(-1000, 1000))
            for _ in range(rng.randint(3, 120))
        ]
        ring = _ring(pts)
        assert len(ring) >= 1
        if len(ring) >= 3:
            for p in pts:
                assert _inside_or_on(ring, p), (ring, p)
            # extreme points are vertices
            assert min(pts) in ring and max(pts) in ring
            # CCW orientation: shoelace area positive
            area2 = sum(
                ring[i][0] * ring[(i + 1) % len(ring)][1]
                - ring[(i + 1) % len(ring)][0] * ring[i][1]
                for i in range(len(ring))
            )
            assert area2 > 0


def test_hull_idempotent():
    rng = random.Random(37)
    pts = [(rng.randint(0, 500), rng.randint(0, 500)) for _ in range(200)]
    ring = _ring(pts)
    assert _ring(ring) == _ring(pts) or set(_ring(ring)) == set(ring)


def test_hull_of_union_equals_hull_of_part_hulls():
    """The distributed law: partition the points, hull each part,
    union the part hulls, re-hull -- identical vertex set to the
    one-shot hull. This is the per-partition Arrow scale path."""
    rng = random.Random(41)
    for _ in range(20):
        pts = [
            (rng.randint(-800, 800), rng.randint(-800, 800))
            for _ in range(150)
        ]
        parts = [pts[i::4] for i in range(4)]
        merged = []
        for part in parts:
            merged.extend(_ring(part))
        assert set(_ring(merged)) == set(_ring(pts))


def test_collinear_degenerate():
    pts = [(i, 2 * i) for i in range(10)]
    ring = _ring(pts)
    assert set(ring) == {(0, 0), (9, 18)}
