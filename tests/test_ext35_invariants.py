"""Definition-level checks for the ext35 batch."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext35 import (
    q_langid_confusion,
    q_median_ci_orderstat,
    q_multimodal_audio_energy,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_audio_energy_matches_literal_pcm(spark, sf_dir):
    got = q_multimodal_audio_energy(spark, sf_dir).toPandas()
    docs = read_table(spark, sf_dir, "documents").select("doc_id").toPandas()
    expect = {}
    for doc_id in docs.doc_id:
        buf = b"".join(
            hashlib.md5(f"{doc_id}a{i}".encode()).digest() for i in range(32)
        )
        samples = np.frombuffer(buf, dtype="<i2").astype(np.int64)
        assert len(samples) == 256
        for w in range(4):
            s = samples[w * 64 : (w + 1) * 64]
            expect[(doc_id, w)] = (
                int(np.abs(s).max()),
                int(((s[:-1] * s[1:]) < 0).sum()),
                float(np.sqrt((s.astype(np.float64) ** 2).mean())),
            )
    assert len(got) == len(expect)
    for r in got.itertuples():
        peak, zc, rms = expect[(r.media_id, r.win_idx)]
        assert int(r.peak_abs) == peak
        assert int(r.n_zero_cross) == zc
        assert math.isclose(float(r.rms), rms, abs_tol=1e-5)


def test_audio_operator_nulls_on_corrupt_rows(spark, sf_dir):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        audio_window_stats,
    )

    media = spark.createDataFrame(
        [(1, bytes(128)), (2, bytes(65)), (3, bytes(96))],
        "media_id long, content binary",
    )
    out = audio_window_stats(media, window_samples=64).toPandas()
    ok = out[out.media_id == 1]
    assert list(ok.win_idx) == [0] and int(ok.peak_abs.iloc[0]) == 0
    for mid in (2, 3):  # odd byte count; 48 samples not a window multiple
        bad = out[out.media_id == mid]
        assert len(bad) == 1 and bad.rms.isna().all()


def test_langid_confusion_matches_per_doc_predictions(spark, sf_dir):
    got = q_langid_confusion(spark, sf_dir).toPandas()
    docs = read_table(spark, sf_dir, "documents").select("lang", "text").toPandas()
    cells: dict = {}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        h_en = sum(t in ("the", "a", "fast") for t in toks)
        h_es = sum(t in ("data", "row") for t in toks)
        h_zh = sum(t in ("table", "join") for t in toks)
        pred = "en" if h_en >= h_es and h_en >= h_zh else ("es" if h_es >= h_zh else "zh")
        cells[(r.lang, pred)] = cells.get((r.lang, pred), 0) + 1
    have = {(r.lang, r.predicted): int(r.n) for r in got.itertuples()}
    assert have == cells
    for r in got.itertuples():
        row_total = sum(v for (lg, _), v in cells.items() if lg == r.lang)
        assert int(r.n_true) == row_total
        assert int(r.share_ppm) == (1000000 * int(r.n)) // row_total
        assert int(r.is_correct) == int(r.lang == r.predicted)


def test_median_ci_matches_sorted_order_statistics(spark, sf_dir):
    got = q_median_ci_orderstat(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()
    v = np.sort(np.round(o.o_totalprice * 100).astype("int64").values)
    n = len(v)
    r_med = (n + 1) // 2
    r_lo = max(int(math.floor((n - 1.959964 * math.sqrt(n)) / 2)), 1)
    r_hi = min(int(math.ceil(1 + (n + 1.959964 * math.sqrt(n)) / 2)), n)
    assert int(got.n) == n
    assert (int(got.r_lo), int(got.r_hi)) == (r_lo, r_hi)
    assert int(got.median_cents) == int(v[r_med - 1])
    assert int(got.lo_cents) == int(v[r_lo - 1])
    assert int(got.hi_cents) == int(v[r_hi - 1])
    assert int(got.lo_cents) <= int(got.median_cents) <= int(got.hi_cents)
