"""Definition-level checks for the ext31 batch."""

from __future__ import annotations

import math
from math import comb

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext31 import (
    q_ece_reliability,
    q_pass_at_k,
    q_streaming_hll_replay,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_pass_at_k_matches_binomial_identity(spark, sf_dir):
    got = q_pass_at_k(spark, sf_dir).toPandas().set_index("k")
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "value").toPandas()
    ev["s"] = ((ev.event_type == "purchase") & (ev.value > 150)).astype(int)
    per = ev.groupby("user_id").s.agg(n="size", c="sum")
    for k in (1, 5, 10):
        elig = per[per.n >= k]
        if len(elig) == 0:
            assert k not in got.index
            continue
        vals = []
        for r in elig.itertuples():
            # exact combinatorial identity, independent of the factor chain
            p = 1 - comb(r.n - r.c, k) / comb(r.n, k) if r.n - r.c >= k else 1.0
            vals.append(round(1e9 * p))
        row = got.loc[k]
        assert int(row.n_tasks) == len(elig)
        # factor-chain double product vs comb(): identical to ~1 ulp/task
        assert abs(int(row.mean_pass_e9) - sum(vals) // len(vals)) <= 2
        # pass@k is nondecreasing in k on the common support
    ks = [k for k in (1, 5, 10) if k in got.index]
    means = [int(got.loc[k].mean_pass_e9) for k in ks]
    assert means == sorted(means)


def test_ece_terms_match_literal_reliability(spark, sf_dir):
    got = q_ece_reliability(spark, sf_dir).toPandas().set_index("bin")
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value").toPandas()
    ev["bin"] = np.minimum(np.floor(ev.value / 20.0).astype("int64"), 12)
    ev["half"] = (ev.event_id % 2).astype(int)
    ev["y"] = (ev.event_type == "purchase").astype(int)
    per = ev.pivot_table(index="bin", columns="half", values="y", aggfunc=["size", "sum"])
    rows = {}
    for b in per.index:
        try:
            n_tr, n_ev = int(per.loc[b, ("size", 0)]), int(per.loc[b, ("size", 1)])
            k_tr, k_ev = int(per.loc[b, ("sum", 0)]), int(per.loc[b, ("sum", 1)])
        except (KeyError, ValueError):
            continue
        if n_tr > 0 and n_ev > 0:
            rows[b] = (n_tr, k_tr, n_ev, k_ev)
    ne = sum(v[2] for v in rows.values())
    assert set(got.index) == set(rows)
    ece = 0.0
    for b, (n_tr, k_tr, n_ev, k_ev) in rows.items():
        term = 1e9 * (n_ev / ne) * abs(k_ev / n_ev - k_tr / n_tr)
        assert abs(int(got.loc[b].ece_term_e9) - term) < 2
        ece += term / 1e9
    assert 0.0 <= ece <= 1.0


def test_streaming_hll_fold_equals_batch_sketch(spark, sf_dir):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext31 import (
        fold_hll_stream,
    )

    folded = fold_hll_stream(spark, sf_dir).toPandas().set_index("event_type")
    ev = read_table(spark, sf_dir, "events").select("event_type", "user_id")
    batch = (
        ev.groupBy("event_type")
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
            .cast("bigint")
            .alias("batch_est")
        )
        .toPandas()
        .set_index("event_type")
    )
    # sketch union is associative: the micro-batch fold must produce
    # EXACTLY the single-shot batch estimate, not just land in-band
    assert set(folded.index) == set(batch.index)
    for et in batch.index:
        assert int(folded.loc[et].est) == int(batch.loc[et].batch_est)
    got = q_streaming_hll_replay(spark, sf_dir).toPandas()
    assert got.est_ok.all()
