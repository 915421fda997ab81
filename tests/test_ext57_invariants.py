"""Definition-level checks for the ext57 batch."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext57 import (
    q_average_precision,
    q_review_capacity_capture,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _scored(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("event_type", "value").toPandas()
    ev["v"] = np.round(ev.value * 100).astype("int64")
    ev["y"] = (ev.event_type == "purchase").astype(int)
    return ev


def test_average_precision_matches_literal_spine_walk(spark, sf_dir):
    got = q_average_precision(spark, sf_dir).toPandas().iloc[0]
    ev = _scored(spark, sf_dir)
    spine = ev.groupby("v").y.agg(c="size", k="sum").sort_index(ascending=False)
    pos = int(spine.k.sum())
    tp = nge = 0
    num = 0
    for _, r in spine.iterrows():
        tp += int(r.k)
        nge += int(r.c)
        if r.k > 0:
            num += round(1e9 * int(r.k) * (tp / nge))
    assert int(got.n_positives) == pos
    assert int(got.ap_num_e9) == num
    assert int(got.ap_e9) == num // pos
    # AP is a proper probability-scale score
    assert 0 <= int(got.ap_e9) <= 1000000000


def test_capture_curve_matches_literal_clipping(spark, sf_dir):
    got = q_review_capacity_capture(spark, sf_dir).toPandas().set_index("budget_pct")
    ev = _scored(spark, sf_dir)
    spine = ev.groupby("v").y.agg(c="size", k="sum").sort_index(ascending=False)
    n = int(spine.c.sum())
    pos = int(spine.k.sum())
    for pct in (1, 5, 10):
        cut = (pct * n) // 100
        lo = 0
        captured = 0
        for _, r in spine.iterrows():
            hi = lo + int(r.c)
            if hi <= cut:
                captured += int(r.k)
            elif lo < cut:
                captured += (int(r.k) * (cut - lo)) // int(r.c)
            lo = hi
        row = got.loc[pct]
        assert int(row.budget_rows) == cut
        assert int(row.captured) == captured
        assert int(row.capture_ppm) == (1000000 * captured) // pos
    # more budget can never catch fewer positives
    assert list(got.captured) == sorted(got.captured)
