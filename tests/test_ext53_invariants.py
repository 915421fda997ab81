"""Definition-level checks for the ext53 batch."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext53 import (
    q_goertzel_weekly_power,
    q_hodges_lehmann,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _daily(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = np.round(o.o_totalprice * 100).astype("int64")
    return o.groupby("o_orderdate").c.sum().sort_index().values


def test_goertzel_matches_literal_projection(spark, sf_dir):
    got = q_goertzel_weekly_power(spark, sf_dir).toPandas().set_index("period_days")
    x = _daily(spark, sf_dir)
    n = len(x)
    for p in (7, 30, 11):
        ct = sum(round(0.001 * int(c) * math.cos(2 * math.pi * i / p)) for i, c in enumerate(x))
        st = sum(round(0.001 * int(c) * math.sin(2 * math.pi * i / p)) for i, c in enumerate(x))
        amp = math.sqrt(float(ct) * ct + float(st) * st) / n
        row = got.loc[p]
        assert int(row.n_days) == n
        assert math.isclose(float(row.amplitude_dollars), amp, abs_tol=2e-3)


def test_hodges_lehmann_matches_literal_walsh_median(spark, sf_dir):
    got = q_hodges_lehmann(spark, sf_dir).toPandas().iloc[0]
    x = _daily(spark, sf_dir)
    n = len(x)
    sums = []
    for i in range(n):
        for j in range(i, n):
            sums.append(int(x[i]) + int(x[j]))
    sums.sort()
    m = len(sums)
    hl = sums[(m + 1) // 2 - 1] // 2
    assert int(got.n_pairs) == m == n * (n + 1) // 2
    assert int(got.hl_cents) == hl
    # robustness sanity: HL sits between the min and max daily values
    assert x.min() <= int(got.hl_cents) <= x.max()
