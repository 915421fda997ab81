"""Definition-level invariants for ext231 (fuzzy_name_match scale
twin): the delete-1 neighborhood join must be EXACTLY equivalent to
the blocked levenshtein self-join, and the neighborhood criterion
itself must be complete for edit distance <= 1."""

from __future__ import annotations

import itertools

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

_Q = {q.name: q.fn for q in registry()}

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _dn(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


def test_delete_neighborhood_complete_for_dist_le_1():
    """lev(a,b) <= 1 => D(a) & D(b) != {} on an exhaustive small
    alphabet (the candidate-stage COMPLETENESS proof, brute-forced).
    The converse is deliberately false -- e.g. the transposition
    'ab'/'ba' collides on {'a','b'} at lev 2 -- which is why the query
    keeps the levenshtein verifier after the candidate join."""
    words = ["".join(w) for n in (1, 2, 3) for w in itertools.product("abc", repeat=n)]
    for a in words:
        for b in words:
            if a >= b:
                continue
            if _lev(a, b) <= 1:
                assert _dn(a) & _dn(b), (a, b)
    # the documented false-positive class exists and is filtered:
    assert _dn("ab") & _dn("ba") and _lev("ab", "ba") == 2


def test_djoin_equals_blocked_baseline(spark):
    """The twin returns the exact same row set as fuzzy_name_match."""
    base = {
        tuple(r) for r in _Q["fuzzy_name_match"](spark, SF).collect()
    }
    twin = {
        tuple(r) for r in _Q["fuzzy_name_match_djoin"](spark, SF).collect()
    }
    assert twin == base
    assert len(twin) > 0  # nonvacuous at sf0.001


def test_djoin_candidates_are_supersets(spark):
    """Every emitted pair is same-nation and verified dist <= 1 with
    name_a < name_b (schema-level contract)."""
    rows = _Q["fuzzy_name_match_djoin"](spark, SF).collect()
    for r in rows:
        assert r.name_a < r.name_b
        assert _lev(r.name_a, r.name_b) == r.dist <= 1
