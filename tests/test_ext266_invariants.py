"""Definition-level invariants for ext266: waterfilling conservation/
optimality laws and the greedy-packing fold vs a brute reference --
the shared-formulation failure modes the oracle cannot see."""

from __future__ import annotations

import random

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext266 import (
    _CAP,
    greedy_pack_counts,
    q_token_budget_waterfill,
)

SF_DIR = "/root/testdata/sf0.001"


def _waterfill_ref(avail: dict, budget: int) -> dict:
    """Independent fractional-free reference: iterate the cap-and-
    redistribute fixpoint on integers (terminates in <= K rounds),
    then hand the remainder to the uncapped sources in (avail, name)
    order -- the query's closed form must match exactly."""
    uncapped = dict(avail)
    alloc = {}
    while True:
        if not uncapped:
            break
        level = budget // len(uncapped)
        newly = {s: a for s, a in uncapped.items() if a <= level}
        if not newly:
            break
        for s, a in newly.items():
            alloc[s] = a
            budget -= a
            del uncapped[s]
    level = budget // len(uncapped)
    rem = budget % len(uncapped)
    order = sorted(uncapped, key=lambda s: (avail[s], s))
    for i, s in enumerate(order):
        alloc[s] = level + (1 if i < rem else 0)
    return alloc


def test_waterfill_conservation_and_caps(spark):
    rows = q_token_budget_waterfill(spark, SF_DIR).collect()
    total = sum(r["available_tokens"] for r in rows)
    budget = total // 2
    assert sum(r["allocated_tokens"] for r in rows) == budget
    for r in rows:
        assert 0 <= r["allocated_tokens"] <= r["available_tokens"]
        assert r["capped"] in (0, 1)
        if r["capped"]:
            assert r["allocated_tokens"] == r["available_tokens"]
    # uncapped allocations differ by at most 1 (equal shares + remainder)
    unc = [r["allocated_tokens"] for r in rows if not r["capped"]]
    assert unc and max(unc) - min(unc) <= 1


def test_waterfill_matches_reference_fixpoint(spark):
    rows = q_token_budget_waterfill(spark, SF_DIR).collect()
    avail = {r["source"]: r["available_tokens"] for r in rows}
    want = _waterfill_ref(avail, sum(avail.values()) // 2)
    got = {r["source"]: r["allocated_tokens"] for r in rows}
    assert got == want


def test_greedy_pack_against_brute():
    """Fuzz the shared fold against a direct simulation, including
    oversize docs (own chunk, zero padding for the oversize itself)."""
    rng = random.Random(7)
    for _ in range(50):
        lens = [rng.randint(1, 700) for _ in range(rng.randint(0, 40))]
        chunks, pad = greedy_pack_counts(lens)
        # brute simulation
        bc, brem, bpad = 0, 0, 0
        for n in lens:
            if n > _CAP:
                bpad += brem
                brem = 0
                bc += 1
                continue
            if n > brem:
                bpad += brem
                bc += 1
                brem = _CAP
            brem -= n
        bpad += brem
        assert (chunks, pad) == (bc, bpad), lens
        # capacity identity when no oversize docs
        if lens and all(n <= _CAP for n in lens):
            assert pad == chunks * _CAP - sum(lens)


def test_greedy_never_more_chunks_than_one_per_doc():
    assert greedy_pack_counts([]) == (0, 0)
    assert greedy_pack_counts([_CAP] * 5) == (5, 0)
    assert greedy_pack_counts([600]) == (1, 0)  # oversize: own chunk
    chunks, pad = greedy_pack_counts([100, 500, 100])
    assert chunks == 3 and pad == 3 * _CAP - 700


def test_greedy_vs_concat_bound(spark):
    """Greedy (doc-respecting) can never use FEWER chunks than the
    concat layout's ceiling(total/cap)."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext266 import (
        q_pack_greedy_waste,
    )

    for r in q_pack_greedy_waste(spark, SF_DIR).collect():
        assert r["n_chunks_greedy"] >= r["n_chunks_concat"]
        assert (
            r["padding_greedy"]
            == r["n_chunks_greedy"] * _CAP - r["total_tokens"]
        )  # all docs below cap in this corpus
