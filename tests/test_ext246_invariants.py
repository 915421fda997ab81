"""Definition-level invariants for ext246: DSIR weight laws (target
docs score higher on average; a word exclusive to the target gets a
positive log-ratio) and the Christoffersen LR identities (zero under
exact independence, positive under planted clustering)."""

from __future__ import annotations

import math

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

_Q = {q.name: q.fn for q in registry()}


def _lr_ind(n00, n01, n10, n11):
    def t(c, d):
        return 0.0 if c == 0 else c * math.log(c / d)

    n = n00 + n01 + n10 + n11
    return 2 * (
        t(n00, n00 + n01)
        + t(n01, n00 + n01)
        + t(n10, n10 + n11)
        + t(n11, n10 + n11)
        - t(n00 + n10, n)
        - t(n01 + n11, n)
    )


def test_lr_ind_zero_under_exact_independence():
    """Counts with identical conditional rates give LR = 0 exactly."""
    assert abs(_lr_ind(30, 10, 30, 10)) < 1e-12
    assert abs(_lr_ind(8, 8, 8, 8)) < 1e-12


def test_lr_ind_positive_under_clustering():
    """Sticky exceedances (1 follows 1) inflate LR_ind."""
    assert _lr_ind(40, 2, 2, 16) > 10
    # and anti-clustering (alternation) also registers
    assert _lr_ind(2, 28, 28, 2) > 10


def test_lr_ind_nonnegative_fuzz():
    import random

    rng = random.Random(83)
    for _ in range(200):
        c = [rng.randint(0, 40) for _ in range(4)]
        if (c[0] + c[1]) == 0 or (c[2] + c[3]) == 0:
            continue
        assert _lr_ind(*c) >= -1e-9


def test_dsir_exclusive_word_gets_positive_ratio():
    """Laplace-smoothed log ratio is positive iff the word is
    relatively more frequent in the target bag."""
    tt, ss, v = 1000, 5000, 31
    for tw, sw in ((30, 0), (50, 10), (1, 0)):
        lr = math.log((tw + 1) / (tt + v)) - math.log((sw + 1) / (ss + v))
        assert lr > 0
    lr_neg = math.log((0 + 1) / (tt + v)) - math.log((200 + 1) / (ss + v))
    assert lr_neg < 0


def test_dsir_targets_outscore_sources_on_data(spark):
    """On sf0.001, the mean weight of target docs exceeds the mean of
    source docs (the property importance RESAMPLING relies on) --
    computed over the full corpus, not just the emitted top-20."""
    from pyspark.sql import functions as F

    from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    docs = read_table(spark, sf, "documents").select("doc_id", "text")
    emb = read_table(spark, sf, "embeddings").select("vec_id", "label")
    dom = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        "text",
        F.when(F.col("label") < 2, 1).otherwise(0).alias("is_target"),
    )
    wc = (
        dom.select(
            "doc_id", "is_target", F.explode(F.split("text", " ")).alias("w")
        )
        .groupBy("doc_id", "is_target", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = wc.groupBy("w").agg(
        F.sum(F.when(F.col("is_target") == 1, F.col("c")).otherwise(0)).alias(
            "tw"
        ),
        F.sum(F.when(F.col("is_target") == 0, F.col("c")).otherwise(0)).alias(
            "sw"
        ),
    )
    rows = vocab.collect()
    tt = sum(r["tw"] for r in rows)
    ss = sum(r["sw"] for r in rows)
    v = len(rows)
    lr = {
        r["w"]: math.log((r["tw"] + 1) / (tt + v))
        - math.log((r["sw"] + 1) / (ss + v))
        for r in rows
    }
    per_doc = wc.collect()
    agg: dict = {}
    for r in per_doc:
        key = (r["doc_id"], r["is_target"])
        agg[key] = agg.get(key, 0.0) + r["c"] * lr[r["w"]]
    tvals = [w for (_, t), w in agg.items() if t == 1]
    svals = [w for (_, t), w in agg.items() if t == 0]
    assert sum(tvals) / len(tvals) > sum(svals) / len(svals)
