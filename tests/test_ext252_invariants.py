"""Definition-level invariants for ext252: the KNN-Shapley closed form
equals brute-force Shapley enumeration in exact rationals, the
efficiency identity, and UCB1's regret bound / batch-cut exactness."""

from __future__ import annotations

import math
import random
from fractions import Fraction
from itertools import combinations

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext252 import ucb1_fold

_K = 5


def _utility(subset_sorted_u, k=_K):
    """K-NN utility of an ordered (by distance) membership list of
    match indicators: mean of the first min(K, |S|) indicators over K
    (Jia et al. convention; U(empty) = 0)."""
    if not subset_sorted_u:
        return Fraction(0)
    top = subset_sorted_u[: min(k, len(subset_sorted_u))]
    return Fraction(sum(top), k)


def _brute_shapley(us, k=_K):
    """Exact Shapley values by subset enumeration with factorial
    weights; us = match indicators in distance order (nearest first)."""
    m = len(us)
    fact = [math.factorial(i) for i in range(m + 1)]
    phis = []
    for i in range(m):
        others = [j for j in range(m) if j != i]
        phi = Fraction(0)
        for size in range(m):
            for S in combinations(others, size):
                w = Fraction(fact[size] * fact[m - size - 1], fact[m])
                base = _utility([us[j] for j in sorted(S)], k)
                with_i = _utility([us[j] for j in sorted(S + (i,))], k)
                phi += w * (with_i - base)
        phis.append(phi)
    return phis


def _closed_form(us, k=_K):
    """The telescoped recursion the query implements: s_m = u_m/m,
    s_j = s_{j+1} + (u_j - u_{j+1}) / max(j, K) (1-based j)."""
    m = len(us)
    s = [Fraction(0)] * m
    s[m - 1] = Fraction(us[m - 1], m)
    for j in range(m - 2, -1, -1):
        s[j] = s[j + 1] + Fraction(us[j] - us[j + 1], max(j + 1, k))
    return s


def test_closed_form_equals_brute_shapley():
    """Exact rational equality on every 0/1 pattern of length 7 and a
    few length-8 patterns -- the strongest possible pin of the
    suffix-sum formulation."""
    for mbits in range(2 ** 7):
        us = [(mbits >> b) & 1 for b in range(7)]
        assert _closed_form(us) == _brute_shapley(us)


def test_efficiency_identity_fuzz():
    """sum_j phi_j == U(full set) == mean of the top-K indicators --
    the Shapley efficiency axiom, in exact rationals. Jia's s_m = u_m/m
    base term assumes m >= K (the query's regime always: train size in
    the thousands); below K the recursion and the brute values diverge,
    which test_closed_form_equals_brute also witnesses at m >= K only."""
    rng = random.Random(252)
    for _ in range(200):
        m = rng.randint(_K, 40)
        us = [rng.randint(0, 1) for _ in range(m)]
        total = sum(_closed_form(us), Fraction(0))
        assert total == _utility(us)


def _mk(rewards):
    return [(f"d{i}", r) for i, r in enumerate(rewards)]


def test_ucb1_pulls_every_arm_and_finds_planted_best():
    """With one clearly-best arm, UCB1 pulls it most and the regret
    stays under the Auer logarithmic bound."""
    rng = random.Random(7)
    T = 400
    means = [0.2, 0.3, 0.25, 0.8, 0.35]
    rewards = []
    for _ in range(T):
        rewards.append(
            [
                int(1e9 * min(1.0, max(0.0, m + rng.uniform(-0.1, 0.1))))
                for m in means
            ]
        )
    st = ucb1_fold(_mk(rewards))
    assert all(n >= 1 for n in st["n"])
    best = max(range(5), key=lambda i: st["tot"][i])
    assert best == 3
    assert st["n"][3] == max(st["n"])
    regret = (st["tot"][best] - st["col"]) / 1e9
    deltas = [means[3] - m for i, m in enumerate(means) if i != 3]
    auer = sum(8 * math.log(T) / d + (1 + math.pi**2 / 3) * d for d in deltas)
    assert regret < auer


def test_ucb1_batch_cut_exactness():
    """Folding the same day sequence in arbitrary batch cuts equals the
    one-shot fold -- the property the 35th streaming replay relies on."""
    rng = random.Random(35)
    rewards = [
        [rng.randint(0, 10**9) for _ in range(5)] for _ in range(60)
    ]
    rows = _mk(rewards)
    one = ucb1_fold(rows)
    for _ in range(20):
        cuts = sorted(rng.sample(range(1, 60), 3))
        st = None
        prev = 0
        for c in cuts + [60]:
            st = ucb1_fold(rows[prev:c], state=st)
            prev = c
        assert st == one
