"""Definition-level invariants for ext234 (base64 + Hamming(7,4)):
the from-scratch 6-bit repacking equals stdlib base64 on fuzzed
buffers, and the Hamming code corrects every single-bit error
exhaustively with syndrome == position."""

from __future__ import annotations

import base64
import random

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext234 import (
    _B64_ALPHA,
    _S1_MASK,
    _S2_MASK,
    _S3_MASK,
)

_PAR = lambda x: bin(x).count("1") % 2


def _py_b64(data: bytes) -> str:
    """The oracle's 6-bit repacking, re-derived in Python."""
    out = []
    for g in range(0, len(data), 3):
        chunk = data[g : g + 3]
        w = sum(v * (256 ** (2 - j)) for j, v in enumerate(chunk))
        out.append(_B64_ALPHA[(w >> 18) & 63])
        out.append(_B64_ALPHA[(w >> 12) & 63])
        out.append(_B64_ALPHA[(w >> 6) & 63] if len(chunk) >= 2 else "=")
        out.append(_B64_ALPHA[w & 63] if len(chunk) == 3 else "=")
    return "".join(out)


def _enc(d: int) -> int:
    d0, d1, d2, d3 = (d >> 3) & 1, (d >> 2) & 1, (d >> 1) & 1, d & 1
    p1, p2, p3 = (d0 + d1 + d3) % 2, (d0 + d2 + d3) % 2, (d1 + d2 + d3) % 2
    return p1 * 64 + p2 * 32 + d0 * 16 + p3 * 8 + d1 * 4 + d2 * 2 + d3


def _syn(w: int) -> int:
    return _PAR(w & _S1_MASK) + 2 * _PAR(w & _S2_MASK) + 4 * _PAR(w & _S3_MASK)


def test_b64_repacking_equals_stdlib_fuzz():
    rng = random.Random(13)
    for _ in range(300):
        n = rng.randint(0, 100)
        data = bytes(rng.randrange(256) for _ in range(n))
        assert _py_b64(data) == base64.b64encode(data).decode()


def test_b64_all_padding_classes():
    for n in (54, 55, 56, 57, 58, 59, 60):
        data = bytes(range(n))
        enc = _py_b64(data)
        assert enc == base64.b64encode(data).decode()
        assert enc.count("=") == (3 - n % 3) % 3


def test_hamming_codewords_satisfy_parity_check():
    """H * G = 0: every generator-matrix codeword has zero syndrome
    under the parity-check-mask readout (the two derivations the two
    engines use)."""
    for d in range(16):
        assert _syn(_enc(d)) == 0


def test_hamming_corrects_every_single_bit_error():
    """Exhaustive: 16 nibbles x 7 positions; syndrome equals the
    1-based flipped position and the correction restores the word."""
    for d in range(16):
        c = _enc(d)
        for k in range(7):
            w = c ^ (1 << (6 - k))
            s = _syn(w)
            assert s == k + 1
            assert w ^ (1 << (7 - s)) == c


def test_hamming_min_distance_is_three():
    """All 16 codewords pairwise differ in >= 3 bits -- the property
    that makes single-error correction possible at all."""
    cws = [_enc(d) for d in range(16)]
    for i in range(16):
        for j in range(i + 1, 16):
            assert bin(cws[i] ^ cws[j]).count("1") >= 3
