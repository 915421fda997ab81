"""Definition-level invariants for ext265 (streaming MDCT): the
carried-overlap fold == the one-shot codec under EVERY batch cut, the
buffer stays bounded, and early-emit is provably impossible."""

from __future__ import annotations

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
    MDCT_N,
    encode_mdct,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext265 import (
    mdct_stream_flush,
    mdct_stream_step,
)


def _noise(n, seed=3):
    t = np.arange(n, dtype=np.float64) + seed * 1000
    frac = np.modf(np.sin(t * 12.9898 + 78.233) * 43758.5453)[0]
    return np.round((frac - 0.5) * 65535).astype(np.int64).clip(-32768, 32767)


def _stream(x, cuts):
    st = {"n_seen": 0, "buf_start": 0, "buf": [], "coeffs": []}
    pos = 0
    for c in cuts:
        arr = [(k, int(x[k])) for k in range(pos, c)]
        st = mdct_stream_step(st, arr)
        pos = c
    return st


def test_streamed_equals_oneshot_all_cuts():
    """Every 2-batch cut point of a 30-sample signal yields exactly the
    one-shot coefficient list after flush."""
    x = _noise(30)
    want = encode_mdct(x)
    for cut in range(0, 31, 3):
        st = _stream(x, [cut, 30])
        got = mdct_stream_flush(st, 30)
        assert got == want, cut


def test_streamed_equals_oneshot_many_batches():
    x = _noise(30, seed=8)
    want = encode_mdct(x)
    st = _stream(x, list(range(1, 31)))  # one sample per batch
    assert mdct_stream_flush(st, 30) == want


def test_buffer_bounded():
    """The carried buffer never exceeds 2N + batch size -- the
    boundedness contract that makes this a streaming codec, not a
    buffer-everything fold."""
    x = _noise(128, seed=2)
    st = {"n_seen": 0, "buf_start": 0, "buf": [], "coeffs": []}
    for pos in range(0, 128, 4):
        st = mdct_stream_step(st, [(k, int(x[k])) for k in range(pos, pos + 4)])
        assert len(st["buf"]) <= 2 * MDCT_N + 4, len(st["buf"])
    assert mdct_stream_flush(st, 128) == encode_mdct(x)


def test_no_early_emit():
    """A block is emitted only once its full 2N window has arrived:
    after t samples the coefficient count is exactly
    N * max(0, (t - N) // N + 1) for t < total (no lookahead)."""
    x = _noise(40, seed=4)
    st = {"n_seen": 0, "buf_start": 0, "buf": [], "coeffs": []}
    for t in range(40):
        st = mdct_stream_step(st, [(t, int(x[t]))])
        n_emittable = max(0, (st["n_seen"] - MDCT_N) // MDCT_N + 1)
        assert len(st["coeffs"]) == MDCT_N * n_emittable, t
