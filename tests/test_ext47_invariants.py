"""Definition-level checks for the ext47 batch."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext47 import (
    q_negbin_fit_mom,
    q_trimmed_mean,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_negbin_mom_matches_literal_moments(spark, sf_dir):
    got = q_negbin_fit_mom(spark, sf_dir).toPandas().iloc[0]
    ev = read_table(spark, sf_dir, "events").select("user_id").toPandas()
    k = ev.groupby("user_id").size().values.astype("int64")
    n = len(k)
    m = int(k.sum()) / n
    v = int((k * k).sum()) / n - m * m
    assert int(got.n) == n
    assert math.isclose(float(got.mean_k), m, abs_tol=1e-5)
    assert math.isclose(float(got.var_k), v, abs_tol=1e-4)
    if v > m:
        r = m * m / (v - m)
        p = m / v
        assert math.isclose(float(got.r_hat), r, abs_tol=1e-4)
        assert math.isclose(float(got.p_hat), p, abs_tol=1e-5)
        # MoM consistency: implied mean r(1-p)/p equals the sample mean
        assert math.isclose(r * (1 - p) / p, m, rel_tol=1e-9)
    else:
        assert pd.isna(got.r_hat) and pd.isna(got.p_hat)


def test_trimmed_mean_equals_sorted_array_definition(spark, sf_dir):
    got = q_trimmed_mean(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()
    v = np.sort(np.round(o.o_totalprice * 100).astype("int64").values)
    n = len(v)
    cut = n // 10
    kept = v[cut : n - cut]
    assert int(got.n) == n
    assert int(got.trimmed_each_side) == cut
    assert int(got.n_kept) == len(kept)
    assert int(got.kept_sum_cents) == int(kept.sum())
    assert int(got.trimmed_mean_cents) == int(kept.sum()) // len(kept)
    # robustness sanity: the trimmed mean sits inside the kept range
    assert kept.min() <= int(got.trimmed_mean_cents) <= kept.max()
