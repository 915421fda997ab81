"""Definition-level invariants for ext243 (Gale-Shapley): stability
(no blocking pair), proposer-optimality vs the acceptor-proposing run,
and McVitie-Wilson order independence (random proposal orders yield
the identical matching) -- the law the oracle relies on."""

from __future__ import annotations

import random

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext243 import gale_shapley


def _random_market(rng, n):
    w = {
        (i, j): rng.randint(0, 1000) for i in range(n) for j in range(n)
    }
    prefs_p = [
        sorted(range(n), key=lambda j: (-w[(i, j)], j)) for i in range(n)
    ]
    ranks_a = [
        {
            i: r
            for r, i in enumerate(
                sorted(range(n), key=lambda i: (-w[(i, j)], i))
            )
        }
        for j in range(n)
    ]
    ranks_p = [
        {j: r for r, j in enumerate(prefs_p[i])} for i in range(n)
    ]
    return prefs_p, ranks_a, ranks_p


def _gs_any_order(prefs_p, ranks_a, rng):
    """Deferred acceptance with a RANDOM free-proposer order."""
    n = len(prefs_p)
    nxt = [0] * n
    match_of = [-1] * n
    while True:
        free = [i for i in range(n) if i not in match_of and nxt[i] < n]
        if not free:
            break
        p = rng.choice(free)
        j = prefs_p[p][nxt[p]]
        nxt[p] += 1
        cur = match_of[j]
        if cur == -1 or ranks_a[j][p] < ranks_a[j][cur]:
            match_of[j] = p
    return match_of


def test_stability_no_blocking_pair():
    rng = random.Random(43)
    for _ in range(10):
        n = rng.randint(3, 12)
        prefs_p, ranks_a, ranks_p = _random_market(rng, n)
        match_of = gale_shapley(prefs_p, ranks_a)
        partner_of_p = {p: j for j, p in enumerate(match_of)}
        for i in range(n):
            for j in range(n):
                if partner_of_p[i] == j:
                    continue
                prefers_i = ranks_p[i][j] < ranks_p[i][partner_of_p[i]]
                prefers_j = ranks_a[j][i] < ranks_a[j][match_of[j]]
                assert not (prefers_i and prefers_j), (i, j)


def test_order_independence():
    """McVitie-Wilson: any free-proposer order yields the same
    proposer-optimal matching -- the law letting the SQL oracle use
    smallest-free order while remaining comparable."""
    rng = random.Random(47)
    for _ in range(10):
        n = rng.randint(3, 10)
        prefs_p, ranks_a, _ = _random_market(rng, n)
        base = gale_shapley(prefs_p, ranks_a)
        for _ in range(5):
            assert _gs_any_order(prefs_p, ranks_a, rng) == base


def test_proposer_optimality():
    """Proposers do weakly better in the proposer-run than in the
    role-swapped (acceptor-proposing) run."""
    rng = random.Random(53)
    n = 8
    prefs_p, ranks_a, ranks_p = _random_market(rng, n)
    # swap roles: acceptors propose using their preference order
    prefs_a = [
        sorted(range(n), key=lambda i: ranks_a[j][i]) for j in range(n)
    ]
    ranks_p_asdict = [dict(ranks_p[i]) for i in range(n)]
    m1 = gale_shapley(prefs_p, ranks_a)  # acceptor -> proposer
    m2 = gale_shapley(prefs_a, ranks_p_asdict)  # proposer -> acceptor
    for j, p in enumerate(m1):
        # p's partner rank in proposer-run <= in acceptor-run
        j2 = m2[p]
        assert ranks_p[p][j] <= ranks_p[p][j2]
