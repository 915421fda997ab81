"""Definition-level checks for the ext40 batch."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext40 import (
    q_duplicate_payment_screen,
    q_theil_index,
    q_yules_k_richness,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_yules_k_matches_literal_spectrum(spark, sf_dir):
    got = q_yules_k_richness(spark, sf_dir).toPandas().set_index("source")
    docs = read_table(spark, sf_dir, "documents").select("source", "text").toPandas()
    for src, g in docs.groupby("source"):
        counts = Counter(t for text in g.text for t in text.split(" "))
        n = sum(counts.values())
        spectrum = Counter(counts.values())
        m2 = sum(m * m * vm for m, vm in spectrum.items())
        k = 1e4 * (m2 - n) / (float(n) * n)
        row = got.loc[src]
        assert int(row.n_tokens) == n
        assert int(row.n_types) == len(counts)
        assert math.isclose(float(row.yules_k), k, abs_tol=1e-4)


def test_theil_matches_literal_and_is_bounded(spark, sf_dir):
    got = q_theil_index(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").toPandas()
    o["c"] = np.round(o.o_totalprice * 100).astype("int64")
    spend = o.groupby("o_custkey").c.sum()
    xx, n = int(spend.sum()), len(spend)
    t_e9 = sum(
        round(1e9 * (int(x) / xx) * math.log(int(x) * n / xx)) for x in spend if x > 0
    )
    assert int(got.n_customers) == n
    assert abs(int(got.theil_e9) - t_e9) <= n  # per-term rounding slack
    assert math.isclose(
        float(got.theil_normalized), t_e9 / 1e9 / math.log(n), abs_tol=1e-5
    )
    assert 0.0 <= float(got.theil_normalized) <= 1.0


def test_duplicate_screen_matches_literal_pairs(spark, sf_dir):
    got = q_duplicate_payment_screen(spark, sf_dir).toPandas()
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    ).toPandas()
    ev["dollars"] = (np.round(ev.value * 100).astype("int64")) // 100
    ev["t"] = ev.ts.astype("int64") // 1000
    expect = set()
    for (_, _, _), g in ev.groupby(["user_id", "event_type", "dollars"]):
        rows = sorted(g.itertuples(), key=lambda r: r.event_id)
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                if abs(a.t - b.t) <= 86400000000:
                    expect.add((a.event_id, b.event_id, abs(a.t - b.t)))
    have = {(r.event_a, r.event_b, int(r.gap_us)) for r in got.itertuples()}
    assert have == expect
    assert len(got) > 0  # the screen must actually fire on this corpus
