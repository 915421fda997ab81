"""Definition-level checks for the ext48 batch."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext48 import (
    q_streaming_median_monitor,
    q_turning_point_test,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_streaming_median_equals_batch_median(spark, sf_dir):
    got = q_streaming_median_monitor(spark, sf_dir).toPandas().iloc[0]
    ev = read_table(spark, sf_dir, "events").select("value").toPandas()
    v = np.sort(np.round(ev.value * 100).astype("int64").values)
    n = len(v)
    assert int(got.n_events) == n
    # the folded histogram must reproduce the exact lower-median
    assert int(got.median_cents) == int(v[(n + 1) // 2 - 1])


def test_turning_points_match_literal_scan(spark, sf_dir):
    got = q_turning_point_test(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = np.round(o.o_totalprice * 100).astype("int64")
    days = o.groupby("o_orderdate").c.sum().sort_index().values
    t = sum(
        1
        for a, b, e in zip(days, days[1:], days[2:])
        if (b > a and b > e) or (b < a and b < e)
    )
    n = len(days)
    assert int(got.n_days) == n
    assert int(got.n_turning_points) == t
    et = 2 * (n - 2) / 3
    z = (t - et) / math.sqrt((16 * n - 29) / 90)
    assert math.isclose(float(got.expected_t), et, abs_tol=1e-5)
    assert math.isclose(float(got.z_score), z, abs_tol=1e-5)
    # turning points are interior days only
    assert 0 <= t <= n - 2
