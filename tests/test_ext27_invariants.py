"""Definition-level checks for the ext27 batch: the frame sampler
against a literal hashlib/numpy recompute, and the streaming PSI fold
against a direct batch recompute.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext27 import (
    q_multimodal_frame_sample,
    q_streaming_psi_monitor,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_frame_sample_matches_literal_bytes(spark, sf_dir):
    got = q_multimodal_frame_sample(spark, sf_dir).toPandas()
    docs = read_table(spark, sf_dir, "documents").select("doc_id").toPandas()
    expect = {}
    for doc_id in docs.doc_id:
        buf = b"".join(
            hashlib.md5(f"{doc_id}f{i}".encode()).digest() for i in range(18)
        )
        assert len(buf) == 288
        frames = np.frombuffer(buf, dtype=np.uint8).reshape(6, 48)
        for idx in range(0, 6, 2):
            f = frames[idx].astype(np.float64)
            expect[(doc_id, idx)] = (int(f.sum()), float(f.mean()))
    assert len(got) == len(expect)
    for r in got.itertuples():
        bs, mb = expect[(r.media_id, r.frame_idx)]
        assert int(r.byte_sum) == bs
        assert int(r.n_bytes) == 48
        assert math.isclose(float(r.mean_byte), mb, abs_tol=1e-5)


def test_frame_sampler_nulls_on_corrupt_rows(spark, sf_dir):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        frame_sample_stats,
    )

    media = spark.createDataFrame(
        [(1, bytes(96)), (2, bytes(50)), (3, b"")],
        "media_id long, content binary",
    )
    out = frame_sample_stats(media, frame_bytes=48, every_n=2).toPandas()
    ok = out[out.media_id == 1]
    assert list(ok.frame_idx) == [0] and int(ok.byte_sum.iloc[0]) == 0
    for mid in (2, 3):
        bad = out[out.media_id == mid]
        assert len(bad) == 1 and bad.byte_sum.isna().all()


def test_streaming_psi_equals_batch_recompute(spark, sf_dir):
    got = q_streaming_psi_monitor(spark, sf_dir).toPandas().set_index("bin")
    ev = read_table(spark, sf_dir, "events").select("event_id", "value").toPandas()
    ev["bin"] = np.minimum(np.floor(ev.value / 20.0).astype("int64"), 12)
    per = ev.groupby("bin").event_id.agg(
        n_base=lambda s: int((s % 2 == 0).sum()),
        n_curr=lambda s: int((s % 2 == 1).sum()),
    )
    nb = len(per)
    tb, tc = int(per.n_base.sum()), int(per.n_curr.sum())
    assert set(got.index) == set(per.index)
    for b, r in per.iterrows():
        row = got.loc[b]
        assert (int(row.n_base), int(row.n_curr)) == (int(r.n_base), int(r.n_curr))
        p = (r.n_base + 1) / (tb + nb)
        q = (r.n_curr + 1) / (tc + nb)
        term = 1e9 * (p - q) * math.log(p / q)
        assert abs(int(row.psi_term_e9) - term) < 2
