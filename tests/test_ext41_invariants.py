"""Definition-level checks for the ext41 batch."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext41 import (
    q_haar_wavelet_energy,
    q_image_phash_dedup,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _dhash(doc_id) -> int:
    buf = b"".join(hashlib.md5(f"{doc_id}{s}".encode()).digest() for s in "abc")
    img = np.frombuffer(buf, dtype=np.uint8).reshape(4, 4, 3)
    gray = img.astype(np.int64).sum(axis=2)
    bits = 0
    k = 0
    for r in range(4):
        for c in range(3):
            if gray[r, c] > gray[r, c + 1]:
                bits |= 1 << k
            k += 1
    return bits


def test_phash_pairs_match_literal_hashes(spark, sf_dir):
    got = q_image_phash_dedup(spark, sf_dir).toPandas()
    docs = read_table(spark, sf_dir, "documents").select("doc_id").toPandas()
    hashes = {d: _dhash(d) for d in docs.doc_id}
    expect = set()
    ids = sorted(hashes)
    by_hash: dict = {}
    for d in ids:
        by_hash.setdefault(hashes[d], []).append(d)
    for h, members in by_hash.items():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                expect.add((h, a, b))
    have = {(int(r.dhash), r.media_a, r.media_b) for r in got.itertuples()}
    assert have == expect


def test_phash_operator_nulls_on_corrupt(spark, sf_dir):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        image_dhash,
    )

    media = spark.createDataFrame(
        [(1, bytes(48)), (2, bytes(47))], "media_id long, content binary"
    )
    out = image_dhash(media).toPandas().set_index("media_id")
    assert int(out.loc[1].dhash) == 0  # all-equal grays -> no bits set
    assert pd.isna(out.loc[2].dhash)


def test_haar_energy_matches_numpy_transform(spark, sf_dir):
    got = q_haar_wavelet_energy(spark, sf_dir).toPandas().set_index("level")
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = np.round(o.o_totalprice * 100).astype("int64")
    x = o.groupby("o_orderdate").c.sum().sort_index().values[:256].astype(object)
    for lv in (1, 2, 3):
        det = [int(a) - int(b) for a, b in zip(x[0::2], x[1::2])]
        app = [int(a) + int(b) for a, b in zip(x[0::2], x[1::2])]
        row = got.loc[lv]
        assert int(row.n_coeffs) == len(det)
        assert float(row.energy) == float(sum(d * d for d in det))
        x = np.array(app, dtype=object)
    # Parseval-flavored sanity: total detail energy is positive and the
    # coefficient counts halve per level
    assert (got.energy > 0).all()
    assert list(got.n_coeffs) == [128, 64, 32]
