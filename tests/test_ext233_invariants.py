"""Definition-level invariants for ext233 (PCSA/Flajolet-Martin):
pure-Python re-derivation of the register pipeline, the OR-monoid
merge law, the exact-integer power table, and estimate accuracy on
planted cardinalities (the oracle cannot see shared-formulation
bugs; these can)."""

from __future__ import annotations

import hashlib
import math

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext233 import _L, _M, _PHI

_Q = {q.name: q.fn for q in registry()}


def _h60(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)


def _pcsa(keys):
    regs = [0] * _M
    for k in keys:
        h = _h60(k)
        b, rest = h % _M, h // _M
        rho = 54 if rest == 0 else (rest & -rest).bit_length() - 1
        regs[b] |= 1 << rho
    return regs


def _rank_sum(regs):
    s = 0
    for x in regs:
        y = (x + 1) & (~x)
        s += y.bit_length() - 1
    return s


def _est(s):
    return ((1 << (s // 64)) * _L[s % 64]) // 1_000_000


def test_power_table_is_the_claimed_literal():
    for k in range(_M):
        assert _L[k] == math.floor((_M / _PHI) * 2.0 ** (k / _M) * 1e6 + 0.5)
    assert all(b > a for a, b in zip(_L, _L[1:]))  # strictly increasing


def test_or_monoid_merge_law():
    """PCSA(A ++ B) == PCSA(A) OR PCSA(B), any split."""
    keys = list(range(1, 500))
    whole = _pcsa(keys)
    for cut in (1, 137, 250, 499):
        a, b = _pcsa(keys[:cut]), _pcsa(keys[cut:])
        assert [x | y for x, y in zip(a, b)] == whole


def test_lowest_zero_rank_identity():
    """(x+1) & (-x-1) isolates the lowest zero bit (two's complement:
    -x-1 == ~x), the readout both engines run in BIGINT."""
    for x in [0, 1, 2, 3, 0b1011, 0b1111, (1 << 20) - 1, 0b101111]:
        y = (x + 1) & (-x - 1)
        assert y == (x + 1) & (~x)
        assert x & y == 0 and (x | y) & (y - 1) == y - 1  # bit was 0, all below 1


def test_estimate_tracks_planted_cardinalities():
    """FM's guarantee is a constant-factor one: on planted sets of
    1e2..1e5 keys the exact-integer estimate lands within 40% (the
    64-register sketch's expected band)."""
    for n in (100, 1000, 10_000, 100_000):
        est = _est(_rank_sum(_pcsa(range(n))))
        assert 0.6 * n < est < 1.4 * n, (n, est)


def test_batch_equals_replay(spark):
    """Both-path parity at sf0.001: the live OR-merged replay emits
    the identical rows to the one-shot sketch."""
    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in _Q["pcsa_distinct_sketch"](spark, sf).collect()}
    replay = {tuple(r) for r in _Q["streaming_pcsa_replay"](spark, sf).collect()}
    assert batch == replay and len(batch) > 0
