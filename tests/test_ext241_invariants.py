"""Definition-level invariants for ext241 (ER methodology): the
blocking-quality identities on planted block structures and the
Fellegi-Sunter weight laws (informative fields separate, random
fields don't)."""

from __future__ import annotations

import math


def test_reduction_ratio_identity():
    """Sum of b(b-1)/2 over equal blocks vs the all-pairs count: k
    blocks of size s out of n = k*s records reduce pairs by exactly
    1 - (s-1)/(n-1)."""
    k, s = 25, 60
    n = k * s
    cand = k * s * (s - 1) // 2
    allp = n * (n - 1) // 2
    rr = 1 - cand / allp
    assert abs(rr - (1 - (s - 1) / (n - 1))) < 1e-12


def test_completeness_of_same_key_truth():
    """If every truth pair shares the blocking key, completeness is
    exactly 1 (the nation scheme's by-construction row)."""
    truth = [(1, 2), (3, 4), (5, 6)]
    key = {1: "a", 2: "a", 3: "b", 4: "b", 5: "a", 6: "a"}
    found = sum(1 for a, b in truth if key[a] == key[b])
    assert found == len(truth)


def test_fs_weights_order_fields_by_informativeness():
    """A field that almost always agrees on matches and rarely on
    non-matches gets a large positive agreement weight; an
    uninformative field's weight is near zero; weights are monotone
    in m/u."""
    def w(ma, mn, ua, un):
        m = (ma + 1) / (mn + 2)
        u = (ua + 1) / (un + 2)
        return math.log(m / u)

    strong = w(98, 100, 2, 1000)
    weak = w(50, 100, 499, 1000)
    assert strong > 4.0
    assert abs(weak) < 0.1
    assert w(98, 100, 2, 1000) > w(90, 100, 2, 1000) > w(90, 100, 20, 1000)


def test_fs_disagreement_weight_is_negative_for_informative():
    m, u = 0.98, 0.02
    assert math.log((1 - m) / (1 - u)) < -3.0


def test_ring_sample_is_derangement_like():
    """The md5-ring offsets never pair a record with itself for
    offsets not divisible by n."""
    n = 17
    for off in (1, 2, 5):
        assert all((rk + off - 1) % n + 1 != rk for rk in range(1, n + 1))
