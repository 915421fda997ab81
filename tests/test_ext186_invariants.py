"""Definition-level invariants for the ext186 batch (baseline JPEG).

The oracle can only prove Spark == DuckDB; these re-derive the codec's
guarantees independently so a shared formulation bug can't hide:
bitstream spec conformance, entropy-layer exactness on adversarial
coefficient patterns (ZRL runs, multi-block DC prediction), the
pixel path's identity with the pure integer transform, and that the
decoder truly reads tables from the file rather than from constants.
No SparkSession needed -- the codec is plain Python/numpy.
"""

from __future__ import annotations

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
    JPEG_DCT_BITS,
    JPEG_QUANT,
    _huff_codes,
    _JPEG_AC_BITS,
    _JPEG_AC_VALS,
    _JPEG_DC_BITS,
    _JPEG_DC_VALS,
    decode_jpeg,
    dequant_idct_int,
    encode_jpeg,
    fdct_quant_int,
    jpeg_dct_table,
    jpeg_zigzag,
)


def test_zigzag_is_the_standard_permutation():
    zz = jpeg_zigzag()
    assert len(zz) == 64 and len(set(zz)) == 64
    # T.81 figure 5 anchor points
    assert zz[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert zz[-3:] == [(6, 7), (7, 6), (7, 7)]


def test_dct_table_is_orthonormal_after_scaling():
    c = np.asarray(jpeg_dct_table(), dtype=np.float64)
    ident = c @ c.T / float((1 << JPEG_DCT_BITS) ** 2)
    # rows of alpha(u)/2 * cos are orthonormal: C C^T = 2^(2k) I, up to
    # the integer rounding of the table entries
    assert np.abs(ident - np.eye(8)).max() < 2e-3


def test_huffman_tables_are_prefix_free():
    for bits, vals in ((_JPEG_DC_BITS, _JPEG_DC_VALS), (_JPEG_AC_BITS, _JPEG_AC_VALS)):
        codes = _huff_codes(bits, vals)
        assert len(codes) == sum(bits)
        as_strings = [format(code, f"0{ln}b") for code, ln in codes.values()]
        assert len(set(as_strings)) == len(as_strings)
        for a in as_strings:
            for b in as_strings:
                if a is not b:
                    assert not b.startswith(a) or a == b
        # T.81 forbids the all-ones code of the max length
        assert all(set(s) != {"1"} or len(s) < 16 for s in as_strings)


def _entropy_roundtrip(img):
    img = np.asarray(img, dtype=np.uint8)
    data = encode_jpeg(img)
    dec, blocks = decode_jpeg(data)
    zz = jpeg_zigzag()
    h, w = img.shape
    bi = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            qc = fdct_quant_int(img[by:by + 8, bx:bx + 8].astype(np.int64))
            assert tuple(int(qc[r][c]) for (r, c) in zz) == blocks[bi]
            assert (
                dec[by:by + 8, bx:bx + 8].astype(np.int64)
                == dequant_idct_int(qc)
            ).all()
            bi += 1
    return data, dec, blocks


def test_entropy_layer_exact_on_random_multiblock():
    rng = np.random.RandomState(186)
    for _ in range(20):
        h, w = 8 * rng.randint(1, 5), 8 * rng.randint(1, 5)
        _entropy_roundtrip(rng.randint(0, 256, (h, w)))


def test_dc_prediction_across_blocks():
    # strongly different block means force large +/- DC diffs
    img = np.zeros((8, 32), dtype=np.uint8)
    img[:, 8:16] = 255
    img[:, 16:24] = 3
    img[:, 24:] = 200
    _, _, blocks = _entropy_roundtrip(img)
    dcs = [b[0] for b in blocks]
    assert dcs[1] > dcs[0] and dcs[2] < dcs[1] and dcs[3] > dcs[2]


def test_zrl_long_zero_runs_roundtrip():
    """A sparse high-frequency coefficient pattern forces >15-zero runs
    (the ZRL escape). Build pixels by INVERTING a target pattern with a
    uniform Q=1 table so the re-forward transform lands near it, then
    assert the produced blocks actually contain a >=16 zero run AND the
    entropy layer still roundtrips exactly."""
    ones = tuple(tuple(1 for _ in range(8)) for _ in range(8))
    zz = jpeg_zigzag()
    target = np.zeros((8, 8), dtype=np.int64)
    r, c = zz[40]
    target[r][c] = 120  # lone coefficient deep in the zigzag tail
    img = dequant_idct_int(target, quant=ones).astype(np.uint8)
    data = encode_jpeg(img, quant=ones)
    _, blocks = decode_jpeg(data)
    coef = blocks[0]
    runs, run = [], 0
    for v in coef[1:]:
        if v == 0:
            run += 1
        else:
            runs.append(run)
            run = 0
    assert max(runs, default=0) >= 16, f"fixture failed to force ZRL: {coef}"
    qc = fdct_quant_int(img.astype(np.int64), quant=ones)
    assert tuple(int(qc[rr][cc]) for (rr, cc) in zz) == coef


def test_decoder_reads_tables_from_the_file():
    """Encoding with a uniform Q=1 DQT must make the roundtrip
    near-lossless (max err <= 1) -- impossible if the decoder used the
    Annex-K constants instead of the file's own table."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    ones = tuple(tuple(1 for _ in range(8)) for _ in range(8))
    dec, _ = decode_jpeg(encode_jpeg(img, quant=ones))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1
    # and the default table is genuinely lossy on noise (sanity contrast)
    dec2, _ = decode_jpeg(encode_jpeg(img))
    assert np.abs(dec2.astype(int) - img.astype(int)).max() > 1


def test_bitstream_is_spec_conformant():
    rng = np.random.RandomState(99)
    data = encode_jpeg(rng.randint(0, 256, (16, 24)).astype(np.uint8))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    # walk marker segments to SOS; after it, every 0xFF must be followed
    # by 0x00 (stuffing) until the trailing EOI
    pos = 2
    seen = []
    while True:
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        seen.append(marker)
        ln = int.from_bytes(data[pos + 2:pos + 4], "big")
        pos += 2 + ln
        if marker == 0xDA:
            break
    assert {0xDB, 0xC0, 0xC4, 0xDA} <= set(seen)
    i = pos
    while i < len(data) - 2:
        if data[i] == 0xFF:
            assert data[i + 1] == 0x00, f"bare 0xFF at {i}"
            i += 2
        else:
            i += 1


def test_quantization_error_is_bounded_and_zero_where_expected():
    # flat tiles quantize to DC-only: error <= 1 everywhere
    for level in (0, 17, 128, 200, 255):
        img = np.full((8, 8), level, dtype=np.uint8)
        dec, blocks = decode_jpeg(encode_jpeg(img))
        assert np.abs(dec.astype(int) - level).max() <= 1
        assert all(v == 0 for v in blocks[0][1:])
    # worst-case noise error stays within the Q-table's theoretical bound
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    dec, _ = decode_jpeg(encode_jpeg(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 128


def test_unsupported_profiles_raise():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")  # no SOI
    # flip SOF0 -> SOF2 (progressive)
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((7, 8), dtype=np.uint8))  # non-multiple of 8
