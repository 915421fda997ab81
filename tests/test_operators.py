"""Unit tests for the beyond-reference operator modules: as-of join edge
cases, dedup tiers, similarity LSH recall, multimodal plumbing, approx
aggregate accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.asof import asof_join_backward
from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
    dedup_by_content,
    extract_features,
    frame_sample_plan,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import (
    cosine_topk,
    lsh_cosine_topk,
)


# ----------------------------------------------------------------- as-of --
def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [Row(k=1, lts=10, x="a"), Row(k=1, lts=25, x="b"), Row(k=1, lts=5, x="c"),
         Row(k=2, lts=10, x="d")]
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=10, p=100), Row(k=1, rts=20, p=200), Row(k=3, rts=1, p=999)]
    )
    got = {
        (r.k, r.lts): r.p
        for r in asof_join_backward(left, right, "k", "lts", "rts", ["p"]).collect()
    }
    assert got[(1, 10)] == 100   # equality matches (ts >= right ts)
    assert got[(1, 25)] == 200   # latest preceding
    assert got[(1, 5)] is None   # nothing precedes
    assert got[(2, 10)] is None  # key with no right rows


# ----------------------------------------------------------------- dedup --
def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [Row(id=3, text="aa bb"), Row(id=1, text="aa bb"), Row(id=2, text="cc")]
    )
    got = {r.keep_id: r.n_copies for r in exact_dedup(df, "id", "text").collect()}
    assert got == {1: 2, 2: 1}


def test_minhash_identical_docs_share_all_bands(spark):
    df = spark.createDataFrame(
        [Row(id=1, text="x y z"), Row(id=2, text="z y x"), Row(id=3, text="totally different words")]
    )
    sigs = minhash_signatures(df, "id", "text", n_hashes=8)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sigs, "id", n_hashes=8, band_size=2).collect()
    }
    assert (1, 2) in pairs           # token-set-identical docs always collide
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_lsh_hot_bucket_cap(spark):
    """max_bucket_size must bound candidate fan-out on a degenerate
    corpus: 40 token-set-identical docs share every band bucket, which
    uncapped yields 40*39/2 = 780 pairs; with the cap below the bucket
    size, those buckets are dropped entirely. A small distinct near-dup
    pair in its own (under-cap) bucket must survive."""
    rows = [Row(id=i, text="x y z") for i in range(40)]
    rows += [Row(id=100, text="p q r s t"), Row(id=101, text="t s r q p")]
    df = spark.createDataFrame(rows)
    sigs = minhash_signatures(df, "id", "text", n_hashes=8)
    uncapped = lsh_candidate_pairs(sigs, "id", n_hashes=8, band_size=2)
    assert uncapped.count() == 780 + 1
    capped = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            sigs, "id", n_hashes=8, band_size=2, max_bucket_size=10
        ).collect()
    }
    assert capped == {(100, 101)}  # hot buckets dropped, small one kept


def test_jaccard_pairs_exact_value(spark):
    df = spark.createDataFrame(
        [Row(id=1, text="a b c d", blk="x"), Row(id=2, text="a b c e", blk="x"),
         Row(id=3, text="a b", blk="y")]
    )
    got = ngram_jaccard_pairs(df, "id", "text", "blk", threshold=0.5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.jaccard == 0.6  # |{a,b,c}| / |{a,b,c,d,e}|


def test_simhash_similar_docs_close_in_hamming(spark):
    df = spark.createDataFrame(
        [Row(id=1, text="the quick brown fox jumps over the lazy dog today"),
         Row(id=2, text="the quick brown fox jumps over the lazy cat today"),
         Row(id=3, text="completely unrelated content about spark executors and shuffles")]
    )
    sh = {r.id: r.simhash for r in simhash64(df, "id", "text").collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sh[1], sh[2]) < hamming(sh[1], sh[3])
    assert hamming(sh[1], sh[2]) < hamming(sh[2], sh[3])


# ------------------------------------------------------------ similarity --
@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )


def test_lsh_topk_subset_of_bruteforce_space(vectors):
    queries = vectors.filter(F.col("vec_id") < 5)
    exact = cosine_topk(vectors, queries, k=3).collect()
    approx = lsh_cosine_topk(vectors, queries, dim=64, k=3, n_planes=4).collect()
    exact_map = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    # LSH cosines must agree with brute force wherever both report a pair.
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_map:
            assert abs(r.cosine - exact_map[(r.query_id, r.neighbor_id)]) < 1e-9
    # recall over the 5 queries should be nontrivial (same-bucket wedge)
    hits = sum(1 for r in approx if (r.query_id, r.neighbor_id) in exact_map)
    assert hits >= 1


# ------------------------------------------------------------ multimodal --
@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("image/fake").alias("mime_type"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
    )


def test_extract_features_shapes(media):
    out = extract_features(media)
    rows = out.collect()
    assert len(rows) == media.count()
    r = rows[0]
    assert r.n_bytes > 0
    assert len(r.digest) == 32
    assert len(r.feature) == 8
    assert all(0.0 <= f <= 1.0 for f in r.feature)


def test_extract_features_null_content_survives(spark):
    df = spark.createDataFrame(
        [Row(media_id=1, content=bytearray(b"abc"), mime_type="x", width=1, height=1),
         Row(media_id=2, content=None, mime_type="x", width=1, height=1)]
    )
    got = {r.media_id: r for r in extract_features(df).collect()}
    assert got[1].feature is not None
    assert got[2].feature is None and got[2].digest is None  # bad shard tolerated


def test_media_dedup_jvm_side(spark):
    df = spark.createDataFrame(
        [Row(media_id=1, content=bytearray(b"same")), Row(media_id=2, content=bytearray(b"same")),
         Row(media_id=3, content=bytearray(b"other"))]
    )
    got = {r.keep_id: r.n_copies for r in dedup_by_content(df).collect()}
    assert got == {1: 2, 3: 1}


def test_frame_sample_plan_shape(media):
    plan = frame_sample_plan(media.limit(5), every_n=10)
    rows = plan.collect()
    assert {c for c in plan.columns} == {"media_id", "frame_idx"}
    assert all(r.frame_idx % 10 == 0 for r in rows)


# ----------------------------------------------------------------- approx --
def test_approx_count_distinct_within_bounds(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).collect()[0]
    assert abs(got.approx - got.exact) / got.exact < 0.1  # HLL++ default rsd 5%


def test_raw8_image_stats_real_decode(spark):
    """The raw8 tier is REAL: stats and thumbnail must equal numpy
    computed directly on the source buffers; corrupt rows yield NULLs."""
    import numpy as np
    from pyspark.sql import Row

    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        image_channel_stats,
        resize_nearest,
    )

    rng = np.random.RandomState(7)
    imgs = {i: rng.randint(0, 256, size=(4 + i, 6, 3), dtype=np.uint8) for i in range(3)}
    rows = [
        Row(media_id=i, content=bytearray(img.tobytes()), mime_type="image/raw8",
            width=6, height=img.shape[0])
        for i, img in imgs.items()
    ]
    rows.append(Row(media_id=99, content=bytearray(b"\x01\x02"), mime_type="image/raw8",
                    width=6, height=4))  # corrupt: wrong byte count
    media = spark.createDataFrame(rows)
    got = {r["media_id"]: r for r in image_channel_stats(media).collect()}

    for i, img in imgs.items():
        f = img.astype(np.float64)
        assert got[i]["mean_r"] == f[..., 0].mean()
        assert got[i]["mean_g"] == f[..., 1].mean()
        assert got[i]["mean_b"] == f[..., 2].mean()
        assert abs(got[i]["std_gray"] - f.mean(axis=2).std()) < 1e-12
        expected_thumb = resize_nearest(img, 2, 2).reshape(-1) / 255.0
        np.testing.assert_allclose(got[i]["thumb"], expected_thumb, rtol=1e-6)
    assert got[99]["mean_r"] is None and got[99]["thumb"] is None


def test_resize_nearest_identity_and_downscale():
    import numpy as np

    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import resize_nearest

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    np.testing.assert_array_equal(resize_nearest(img, 4, 4), img)
    half = resize_nearest(img, 2, 2)
    np.testing.assert_array_equal(half, img[[0, 2]][:, [0, 2]])
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)


# ---------------------------------------------------------------------------
# PNG codec (round 5): the stdlib-zlib encoder/decoder must roundtrip
# pixel-exactly across every filter type, reject corrupt containers, and
# the Arrow operator must surface stats + roundtrip proof.
# ---------------------------------------------------------------------------
def test_png_roundtrip_all_filters_and_shapes():
    import numpy as np

    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    # >=5 rows forces 'cycle' mode through None/Sub/Up/Average/Paeth
    for shape in [(5, 4, 3), (8, 8, 1), (7, 3, 4), (1, 1, 3), (13, 17, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for mode in ("cycle", "none"):
            out = decode_png(encode_png(img, filter_mode=mode))
            assert out.shape == img.shape
            assert (out == img).all(), (shape, mode)
    # gradient image: Sub/Up/Average/Paeth all predict well -> small IDAT
    grad = np.add.outer(np.arange(32), np.arange(32))[..., None].astype(np.uint8)
    grad = np.repeat(grad, 3, axis=2)
    assert (decode_png(encode_png(grad)) == grad).all()


def test_png_decoder_rejects_corruption():
    import numpy as np
    import pytest as _pytest

    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    img = np.arange(60, dtype=np.uint8).reshape(5, 4, 3)
    good = encode_png(img)
    with _pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    flipped = bytearray(good)
    flipped[20] ^= 0xFF  # inside IHDR body -> CRC mismatch
    with _pytest.raises(ValueError):
        decode_png(bytes(flipped))
    with _pytest.raises(ValueError):
        decode_png(good[: len(good) // 2])  # truncated


def test_png_channel_stats_matches_numpy(spark):
    import numpy as np

    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        encode_png,
        png_channel_stats,
    )

    rng = np.random.default_rng(3)
    imgs = {i: rng.integers(0, 256, (5, 4, 3), dtype=np.uint8) for i in range(4)}
    gray = rng.integers(0, 256, (5, 4, 1), dtype=np.uint8)
    rows = [
        (i, bytes(encode_png(im)), "image/png", 4, 5) for i, im in imgs.items()
    ] + [
        (99, b"corrupt", "image/png", 4, 5),
        (50, bytes(encode_png(gray)), "image/png", 4, 5),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, mime_type string, width int, height int"
    )
    got = {r["media_id"]: r for r in png_channel_stats(media).collect()}
    assert got[99]["n_bytes"] is None and got[99]["roundtrip_exact"] is None
    for i, im in imgs.items():
        f = im.astype(np.float64)
        assert got[i]["n_bytes"] == 60
        assert got[i]["roundtrip_exact"] is True
        assert abs(got[i]["mean_r"] - f[..., 0].mean()) < 1e-12
        assert abs(got[i]["std_gray"] - f.mean(axis=2).std()) < 1e-12
    # grayscale: channel-0 mean only; green/blue must be NULL, not copies
    g = gray.astype(np.float64)
    assert abs(got[50]["mean_r"] - g[..., 0].mean()) < 1e-12
    assert got[50]["mean_g"] is None and got[50]["mean_b"] is None
    assert got[50]["roundtrip_exact"] is True


def test_gif_codec_roundtrip_and_corruption():
    import numpy as np
    import pytest as _pytest

    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        _lzw_compress,
        _lzw_decompress,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(7)
    pal = ((np.arange(256)[:, None] * np.array([1, 2, 7])) % 256).astype(np.uint8)
    # random (9->12-bit width growth + dict reset on the big one),
    # constant (long LZW runs), gradient (repeating phrases)
    cases = [
        rng.integers(0, 256, (6, 10), dtype=np.uint8),
        np.full((5, 5), 7, np.uint8),
        (np.arange(64 * 64).reshape(64, 64) % 256).astype(np.uint8),
        rng.integers(0, 256, (128, 128), dtype=np.uint8),
    ]
    for img in cases:
        idx, p2 = decode_gif(encode_gif(img, pal))
        assert (idx == img).all() and (p2 == pal).all()
    good = encode_gif(cases[0], pal)
    assert good[:6] == b"GIF89a" and good[-1] == 0x3B
    for bad in (b"", b"GIF89a" + b"\x00" * 5, good[:-3], b"x" * 20):
        with _pytest.raises(ValueError):
            decode_gif(bad)
    # LZW layer alone: a 100k-symbol run survives reset cycles
    s = bytes([3]) * 100_000
    assert _lzw_decompress(_lzw_compress(s)) == s


def test_gif_channel_stats_matches_numpy(spark):
    import numpy as np

    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        encode_gif,
        gif_channel_stats,
    )

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    imgs = {i: rng.integers(0, 256, (6, 10), dtype=np.uint8) for i in range(3)}
    rows = [
        (i, bytes(encode_gif(im, pal)), "image/gif", 10, 6) for i, im in imgs.items()
    ] + [(99, b"corrupt", "image/gif", 10, 6)]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, mime_type string, width int, height int"
    )
    got = {r["media_id"]: r for r in gif_channel_stats(media).collect()}
    assert got[99]["n_bytes"] is None and got[99]["roundtrip_exact"] is None
    for i, im in imgs.items():
        rgb = pal[im].astype(np.float64)
        assert got[i]["n_bytes"] == 180
        assert got[i]["roundtrip_exact"] is True
        assert abs(got[i]["mean_r"] - rgb[..., 0].mean()) < 1e-12
        assert abs(got[i]["mean_g"] - rgb[..., 1].mean()) < 1e-12
        assert abs(got[i]["mean_b"] - rgb[..., 2].mean()) < 1e-12
        assert abs(got[i]["std_gray"] - rgb.mean(axis=2).std()) < 1e-12
