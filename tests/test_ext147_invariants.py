"""ext147: codec-level property tests (BMP/WAV roundtrips on
adversarial shapes -- padding-sensitive widths, extreme samples,
extra chunks) plus a literal Qn re-derivation."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext147 import (
    _QN_D,
    q_multimodal_bmp_stats,
    q_multimodal_wav_stats,
    q_qn_scale_daily,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 7])  # all padding classes
def test_bmp_roundtrip_all_padding_widths(w):
    rng = np.arange(3 * w * 3, dtype=np.uint8).reshape(3, w, 3) * 41 % 256
    data = encode_bmp(rng)
    out = decode_bmp(data)
    assert (out == rng).all()
    assert encode_bmp(out) == data
    # row stride really is 4-byte aligned
    assert (len(data) - 54) % 4 == 0


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"NOTABMP" + b"\x00" * 60)


def test_wav_roundtrip_extremes_and_extra_chunks():
    s = np.array([-32768, 32767, 0, -1, 1, 12345, -12345], dtype=np.int16)
    data = encode_wav(s, 44100)
    out, rate = decode_wav(data)
    assert rate == 44100 and (out == s).all()
    # tolerate an extra chunk before data (chunk-walk decode)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = data[:12] + extra + data[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    out2, rate2 = decode_wav(patched)
    assert rate2 == 44100 and (out2 == s).all()


def test_bmp_query_matches_hex_bytes(spark, sf_dir):
    rows = q_multimodal_bmp_stats(spark, sf_dir).limit(20).collect()
    import hashlib

    for r in rows:
        mid = r["media_id"]
        hexs = b"".join(
            hashlib.md5(f"{mid}{suf}".encode()).digest() for suf in "abcd"
        )[:60]
        arr = np.frombuffer(hexs, np.uint8).astype(np.float64).reshape(20, 3)
        assert r["n_bytes"] == 118
        assert r["roundtrip_exact"] is True
        assert r["mean_r"] == pytest.approx(arr[:, 0].mean(), abs=1e-5)
        assert r["mean_g"] == pytest.approx(arr[:, 1].mean(), abs=1e-5)
        assert r["mean_b"] == pytest.approx(arr[:, 2].mean(), abs=1e-5)
        assert r["std_gray"] == pytest.approx(arr.mean(axis=1).std(), abs=1e-5)


def test_wav_query_matches_hex_bytes(spark, sf_dir):
    rows = q_multimodal_wav_stats(spark, sf_dir).limit(20).collect()
    import hashlib
    import math

    for r in rows:
        mid = r["media_id"]
        hexs = b"".join(
            hashlib.md5(f"{mid}{suf}".encode()).digest() for suf in "abcd"
        )[:60]
        s = np.frombuffer(hexs, dtype="<i2").astype(np.int64)
        assert r["n_bytes"] == 104
        assert r["n_samples"] == 30
        assert r["roundtrip_exact"] is True
        assert r["rms"] == pytest.approx(math.sqrt((s * s).sum() / 30), abs=1e-5)
        assert r["peak_abs"] == int(np.abs(s).max())
        assert r["zero_crossings"] == int(((s[:-1] * s[1:]) < 0).sum())


def test_qn_matches_literal(spark, sf_dir):
    row = q_qn_scale_daily(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    xs = [per[d] for d in sorted(per)]
    n = len(xs)
    diffs = sorted(
        abs(xs[i] - xs[j]) for i in range(n) for j in range(i + 1, n)
    )
    h = n // 2 + 1
    k = h * (h - 1) // 2
    qn = diffs[k - 1]
    assert row["n_days"] == n
    assert row["order_stat_k"] == k
    assert row["qn_raw_dollars"] == pytest.approx(qn / 100, abs=0.01)
    assert row["qn_scaled_dollars"] == pytest.approx(
        _QN_D * qn / 100, abs=0.01
    )
