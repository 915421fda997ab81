"""QOI codec invariants (ext220): spec-vector conformance, byte-exact
roundtrips on adversarial pixel streams (every op family, wrap-around
diffs, 62-run flushes, index collisions), census==encoder-op
consistency, and size accounting laws."""

from __future__ import annotations

import struct

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
    decode_qoi,
    encode_qoi,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext220 import (
    _qoi_census,
)

_Q = {q.name: q.fn for q in registry()}


def test_header_and_end_marker_spec():
    enc = encode_qoi([(1, 2, 3)], 1, 1)
    assert enc[:4] == b"qoif"
    w, h, ch, cs = struct.unpack_from(">IIBB", enc, 4)
    assert (w, h, ch, cs) == (1, 1, 3, 1)
    assert enc[-8:] == b"\x00" * 7 + b"\x01"
    # (1,2,3) differs from the (0,0,0) seed by (+1,+2,+3): db=3 is
    # outside the DIFF window, dr-dg=-1 and db-dg=1 are in the LUMA
    # window -> a 2-byte LUMA chunk
    assert len(enc) == 14 + 2 + 8
    assert _qoi_census(enc) == {
        "run": 0, "index": 0, "diff": 0, "luma": 1, "rgb": 0
    }


def test_known_op_sequences():
    # a run off the implicit (0,0,0) seed pixel
    enc = encode_qoi([(0, 0, 0)] * 5, 5, 1)
    assert _qoi_census(enc) == {
        "run": 1, "index": 0, "diff": 0, "luma": 0, "rgb": 0
    }
    assert len(enc) == 14 + 1 + 8
    # runs cap at 62: 63 identical seed pixels -> two run chunks
    enc = encode_qoi([(0, 0, 0)] * 63, 63, 1)
    assert _qoi_census(enc)["run"] == 2
    # DIFF: +1 on each channel
    enc = encode_qoi([(1, 1, 1)], 1, 1)
    assert _qoi_census(enc)["diff"] == 1
    # RGB: a jump no window covers
    enc = encode_qoi([(200, 10, 90)], 1, 1)
    assert _qoi_census(enc)["rgb"] == 1
    # INDEX: A, B, A -- the third pixel hits A's slot
    a, b = (10, 20, 30), (200, 100, 50)
    enc = encode_qoi([a, b, a], 3, 1)
    assert _qoi_census(enc)["index"] == 1


def test_wraparound_diffs_roundtrip():
    # 255 -> 0 is dr=+1 under wrap; 0 -> 255 is dr=-1
    streams = [
        [(255, 255, 255), (0, 0, 0), (255, 255, 255)],
        [(254, 0, 128), (255, 255, 127), (1, 1, 129)],
    ]
    for pix in streams:
        enc = encode_qoi(pix, len(pix), 1)
        dec, w, h = decode_qoi(enc)
        assert dec == pix
        assert encode_qoi(dec, w, h) == enc


def test_adversarial_roundtrips_and_census_totals():
    import hashlib

    for seed in range(40):
        hx = hashlib.md5(str(seed).encode()).digest() * 16
        n = 1 + seed * 3
        pix = []
        for p in range(n):
            if p and hx[p] % 3 == 0:
                pix.append(pix[-1])  # forced runs
            elif p and hx[p] % 3 == 1 and p >= 2:
                pix.append(pix[p - 2])  # forced index hits
            else:
                pix.append(
                    (hx[3 * p % 48], hx[(3 * p + 1) % 48], hx[(3 * p + 2) % 48])
                )
        enc = encode_qoi(pix, n, 1)
        dec, w, h = decode_qoi(enc)
        assert dec == pix and (w, h) == (n, 1)
        assert encode_qoi(dec, w, h) == enc
        c = _qoi_census(enc)
        # byte accounting: ops' encoded widths must sum to the body
        body = len(enc) - 14 - 8
        assert body == (
            c["run"] + c["index"] + c["diff"] + 2 * c["luma"] + 4 * c["rgb"]
        )


def test_query_all_roundtrips_exact(spark, sf_dir):
    rows = _Q["multimodal_qoi_stats"](spark, sf_dir).collect()
    assert rows and all(r["roundtrip_exact"] for r in rows)
    for r in rows:
        ops = (
            r["n_run_ops"] + r["n_index_ops"] + r["n_diff_ops"]
            + 2 * r["n_luma_ops"] + 4 * r["n_rgb_ops"]
        )
        assert r["n_bytes"] == 14 + ops + 8
