"""Invariants for the ext214 KMV bottom-k quantile sketch: the min-K
monoid law (partition/merge invariance -- the property that makes the
sketch mergeable at all), realized-error sanity against the DKW bound,
monotone decile estimates, and replay==batch equivalence in-engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_Q = {q.name: q.fn for q in registry()}


def _keyed(spark, sf_dir):
    return read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
    ).select("*", F.md5(F.concat_ws(":", "ok", "ln", "cents")).alias("h"))


def _bottom_k(df, k):
    return [
        (r["h"], r["cents"])
        for r in df.orderBy("h", "ok", "ln").limit(k).collect()
    ]


def test_min_k_monoid_merge_law(spark, sf_dir):
    """bottomK(A union B) == bottomK(bottomK(A) union bottomK(B)):
    the exact law that lets partitions sketch independently and merge
    -- and that makes the streaming carried state equal the one-shot
    batch sketch regardless of batch boundaries."""
    li = _keyed(spark, sf_dir)
    a = li.where(F.pmod("ok", F.lit(2)) == 0)
    b = li.where(F.pmod("ok", F.lit(2)) == 1)
    k = 64
    whole = _bottom_k(li, k)
    sa = a.orderBy("h", "ok", "ln").limit(k)
    sb = b.orderBy("h", "ok", "ln").limit(k)
    merged = _bottom_k(sa.unionByName(sb), k)
    assert whole == merged


def test_partitioning_invariance(spark, sf_dir):
    """The sketch never depends on physical layout: repartitioning the
    input (hash 16 / coalesce 1) yields the identical sample."""
    li = _keyed(spark, sf_dir)
    k = 128
    assert (
        _bottom_k(li.repartition(16, "cents"), k)
        == _bottom_k(li.coalesce(1), k)
        == _bottom_k(li, k)
    )


def test_decile_estimates_monotone_and_within_bound(spark, sf_dir):
    rows = sorted(
        _Q["quantile_sketch_deciles"](spark, sf_dir).collect(),
        key=lambda r: r["i"],
    )
    assert [r["i"] for r in rows] == list(range(1, 10))
    ests = [r["est_cents"] for r in rows]
    assert ests == sorted(ests)  # quantile estimates are monotone
    for r in rows:
        assert r["q_ppm"] == r["i"] * 100000
        assert 0 <= r["ecdf_ppm"] <= 1_000_000
        assert r["abs_err_ppm"] == abs(r["ecdf_ppm"] - r["q_ppm"])
        # realized error must honor the DKW claim the query emits
        assert r["within_bound"] == int(r["abs_err_ppm"] <= 90_000)
        assert r["within_bound"] == 1  # and actually hold on this data


def test_replay_equals_batch_sketch(spark, sf_dir):
    """The carried streaming state is the SAME sketch: decile rows from
    the live replay equal the one-shot batch computation in-engine."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
    ).select(
        "*", F.md5(F.concat_ws(":", "event_id", "cents")).alias("h")
    )
    samp = ev.orderBy("h", "event_id").limit(256)
    ranked = samp.select(
        "cents",
        F.row_number()
        .over(Window.orderBy("cents", "h", "event_id"))
        .alias("r"),
    )
    m = samp.count()
    n = ev.count()
    expected = {}
    by_rank = {r["r"]: r["cents"] for r in ranked.collect()}
    for i in range(1, 10):
        expected[i] = (i * 100000, by_rank[(i * m + 9) // 10], n)
    got = {
        r["i"]: (r["q_ppm"], r["est_cents"], r["n_seen"])
        for r in _Q["streaming_bottomk_quantile_replay"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
