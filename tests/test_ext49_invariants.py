"""Definition-level checks for the ext49 batch."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext49 import (
    q_heaps_law_beta,
    q_peak_concurrency,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_PAD = 15 * 60 * 1000000


def test_heaps_matches_literal_checkpoints(spark, sf_dir):
    got = q_heaps_law_beta(spark, sf_dir).toPandas().set_index("source")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).toPandas()
    for src, g in docs.groupby("source"):
        g = g.sort_values("doc_id")
        half = g.head(len(g) // 2)
        toks_h = [t for text in half.text for t in text.split(" ")]
        toks_f = [t for text in g.text for t in text.split(" ")]
        n_h, n_f = len(toks_h), len(toks_f)
        v_h, v_f = len(set(toks_h)), len(set(toks_f))
        row = got.loc[src]
        assert (int(row.n_half), int(row.n_full)) == (n_h, n_f)
        assert (int(row.v_half), int(row.v_full)) == (v_h, v_f)
        if n_h and v_h and n_h != n_f:
            l8 = lambda x: round(1e8 * math.log(x))
            beta = (l8(v_f) - l8(v_h)) / (l8(n_f) - l8(n_h))
            assert math.isclose(float(row.beta), beta, abs_tol=1e-5)
            # vocabulary growth is sublinear: 0 <= beta <= 1 (Heaps)
            assert -0.01 <= float(row.beta) <= 1.01


def test_peak_concurrency_matches_literal_buckets(spark, sf_dir):
    got = q_peak_concurrency(spark, sf_dir).toPandas()
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts").toPandas()
    ev["t"] = ev.ts.astype("int64") // 1000
    buckets: dict = defaultdict(set)
    for r in ev.itertuples():
        m0 = (r.t - _PAD) // 60000000
        m1 = (r.t + _PAD) // 60000000
        for m in range(m0, m1 + 1):
            buckets[m].add(r.user_id)
    ranked = sorted(((len(u), -m) for m, u in buckets.items()), reverse=True)[:10]
    want = [(-m, n) for n, m in ranked]
    have = [(int(r.minute_epoch), int(r.n_users)) for r in got.itertuples()]
    assert have == want
    # concurrency never exceeds the distinct-user population
    assert got.n_users.max() <= ev.user_id.nunique()
