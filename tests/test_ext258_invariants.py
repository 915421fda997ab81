"""Definition-level invariants for ext258: forward-vs-Viterbi
likelihood dominance, filtering laws, and eigenvector-centrality
Perron properties."""

from __future__ import annotations

import math
import random

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext258 import (
    _E0_DN,
    _E0_UP,
    _E1_DN,
    _E1_UP,
    _PRIOR,
    _T_STAY,
    _T_SWITCH,
    eigencentrality_fold,
    hmm_forward_fold,
)


def _viterbi_ll(signs):
    """Best-path (max-product) log score of the same HMM."""
    s = signs[0]
    d0 = math.log(_PRIOR) + math.log(_E0_UP if s == 1 else _E0_DN)
    d1 = math.log(_PRIOR) + math.log(_E1_UP if s == 1 else _E1_DN)
    for s in signs[1:]:
        e0 = math.log(_E0_UP if s == 1 else _E0_DN)
        e1 = math.log(_E1_UP if s == 1 else _E1_DN)
        n0 = max(d0 + math.log(_T_STAY), d1 + math.log(_T_SWITCH)) + e0
        n1 = max(d0 + math.log(_T_SWITCH), d1 + math.log(_T_STAY)) + e1
        d0, d1 = n0, n1
    return max(d0, d1)


def test_forward_dominates_viterbi():
    """The forward (sum-product) likelihood is >= the single best
    path's (max-product) score -- the marginalization law."""
    rng = random.Random(258)
    for _ in range(30):
        signs = [rng.randint(0, 1) for _ in range(rng.randint(2, 300))]
        ll, a0, a1, bsum, n = hmm_forward_fold(signs)
        assert ll >= _viterbi_ll(signs) - 1e-9
        assert abs(a0 + a1 - 1.0) < 1e-12
        assert 0.0 <= a1 <= 1.0
        assert 0 <= bsum <= n * 10**9


def test_filter_tracks_planted_regime():
    """A long all-up run drives the filtered P(bull) near its
    stationary ceiling; an all-down run drives it near the floor."""
    ll_up, _, a1_up, bsum_up, n = hmm_forward_fold([1] * 200)
    ll_dn, _, a1_dn, bsum_dn, _ = hmm_forward_fold([0] * 200)
    assert a1_up > 0.8 and a1_dn < 0.2
    assert bsum_up > bsum_dn


def test_eigencentrality_perron_laws():
    """On a positive symmetric matrix the Perron vector is positive,
    unit-norm, and the hub of a planted star graph dominates."""
    rng = random.Random(7)
    nodes = list(range(8))
    wmap = {}
    for i in nodes:
        for j in nodes:
            if i != j:
                w = rng.randint(1, 20)
                wmap[(i, j)] = w
                wmap[(j, i)] = w
    v = eigencentrality_fold(nodes, wmap)
    assert abs(sum(x * x for x in v) - 1.0) < 1e-9
    assert all(x > 0 for x in v)
    # planted star: node 0 linked heavily to everyone
    wmap2 = {}
    for j in range(1, 8):
        wmap2[(0, j)] = 1000
        wmap2[(j, 0)] = 1000
        wmap2[(j, (j % 7) + 1)] = 1 if j != (j % 7) + 1 else 0
        wmap2[((j % 7) + 1, j)] = wmap2[(j, (j % 7) + 1)]
    wmap2 = {k: w for k, w in wmap2.items() if w and k[0] != k[1]}
    v2 = eigencentrality_fold(nodes, wmap2)
    assert v2[0] == max(v2)
