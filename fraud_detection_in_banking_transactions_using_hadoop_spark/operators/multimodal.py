"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched mapInPandas operators.

The Spark-side machinery here is real and tested -- schemas, partitioning,
batch iteration, UDF signatures. The actual media decoding is STUBBED
(deterministic fakes clearly marked) because codec libraries are not in
this environment; swap `_decode_image_stub` for PIL/libvips/ffmpeg in a
real deployment without touching the dataflow.

Scale notes: media bytes are the dominant payload, so operators are
written to (a) never shuffle raw bytes -- feature extraction happens
map-side before any exchange; (b) bound Arrow batch memory via
spark.sql.execution.arrow.maxRecordsPerBatch when rows are large;
(c) keep outputs narrow (features + metadata, not pixels).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("mime_type", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def _decode_image_stub(content: bytes) -> list[float]:
    """STUB decode -> 8-dim feature. Deterministic fake: real deployments
    replace this with an image decode + model forward pass. Raises on None
    like a real decoder would on corrupt bytes."""
    if content is None:
        raise ValueError("no content")
    d = hashlib.md5(content).digest()
    return [b / 255.0 for b in d[:8]]


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary media rows.

    Corrupt/missing rows yield NULL feature instead of failing the task
    (at 100 TB some shards WILL be bad; poisoning a 10k-row Arrow batch
    with one exception is not acceptable).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, sizes = [], [], []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    digests.append(None)
                    sizes.append(None)
                    continue
                raw = bytes(content)
                try:
                    feats.append(_decode_image_stub(raw))
                except ValueError:
                    feats.append(None)
                digests.append(hashlib.md5(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.array(sizes, dtype="Int64"),
                    "digest": digests,
                    "feature": feats,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def dedup_by_content(media: DataFrame) -> DataFrame:
    """Exact media dedup on the byte digest -- computed JVM-side (F.md5
    works on BinaryType), so dedup needs no Python at all."""
    return media.groupBy(F.md5("content").alias("digest")).agg(
        F.min("media_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLUMBING: emits (media_id, frame_idx) rows for
    a stubbed frame count derived from metadata. A real implementation
    replaces the count with container parsing; the explode shape -- one
    narrow row per sampled frame, bytes stay put -- is the scalable part."""
    n_frames = (F.coalesce(F.col("width"), F.lit(0)) * 0 + F.length("content") / 1000).cast("int")
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))).alias(
            "frame_idx"
        ),
    )
