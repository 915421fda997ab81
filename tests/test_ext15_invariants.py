"""Definition-level checks for the ext15 batch: the streaming CMS fold
must equal a python sketch built in one pass; odds/CUPED/Zipf get
closed-form recomputes; negative sampling gets the no-positive-leak
and reproducibility properties.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext15 import (
    _P,
    q_cuped_adjustment,
    q_negative_sampling,
    q_odds_ratio_screen,
    q_streaming_cms_replay,
    q_zipf_powerlaw_fit,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _bucket_py(k, i, width):
    return (((k % _P) * (999983 + 104729 * i) + 12289 * i) % _P) % width


def test_streaming_cms_equals_python_sketch(spark, sf_dir):
    got = q_streaming_cms_replay(spark, sf_dir).toPandas()
    users = read_table(spark, sf_dir, "events").select("user_id").toPandas()["user_id"]
    cells: dict = {}
    for k in users:
        for i in range(4):
            cells[(i, _bucket_py(int(k), i, 256))] = (
                cells.get((i, _bucket_py(int(k), i, 256)), 0) + 1
            )
    exact = users.value_counts()
    for r in got.itertuples():
        est = min(cells[(i, _bucket_py(int(r.user_id), i, 256))] for i in range(4))
        assert r.est_cnt == est
        assert r.exact_cnt == exact[r.user_id]
        assert r.est_cnt >= r.exact_cnt  # CMS overestimates


def test_odds_ratio_matches_closed_form(spark, sf_dir):
    got = q_odds_ratio_screen(spark, sf_dir).toPandas().iloc[0]
    a, b, c, d = int(got.a), int(got.b), int(got.c), int(got.d)
    orr = (a / b) / (c / d)
    assert math.isclose(float(got.odds_ratio), orr, rel_tol=1e-6)
    assert math.isclose(
        float(got.relative_risk), (a / (a + b)) / (c / (c + d)), rel_tol=1e-6
    )
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert math.isclose(float(got.or_ci_lo), math.exp(math.log(orr) - 1.959964 * se), rel_tol=1e-5)
    assert math.isclose(float(got.or_ci_hi), math.exp(math.log(orr) + 1.959964 * se), rel_tol=1e-5)
    assert float(got.or_ci_lo) <= float(got.odds_ratio) <= float(got.or_ci_hi)


def test_cuped_preserves_mean_and_matches_numpy(spark, sf_dir):
    got = q_cuped_adjustment(spark, sf_dir).toPandas().set_index("variant")
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "value").toPandas()
    per = ev.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "x": int((g.event_type == "view").sum()),
                "y": int(((g.value * 100).round() * (g.event_type == "purchase")).sum()),
            }
        ),
        include_groups=False,
    )
    per["variant"] = per.index % 2
    x, y = per["x"].to_numpy(float), per["y"].to_numpy(float)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    for v in (0, 1):
        arm = per[per.variant == v]
        raw = arm["y"].mean()
        adj = raw - theta * (arm["x"].mean() - x.mean())
        assert math.isclose(float(got.loc[v, "raw_mean_cents"]), raw, rel_tol=1e-6)
        assert math.isclose(float(got.loc[v, "cuped_mean_cents"]), adj, rel_tol=1e-5)
    # CUPED leaves the pooled (weighted) mean unchanged
    n0, n1 = int(got.loc[0, "n_arm"]), int(got.loc[1, "n_arm"])
    pooled_raw = (got.loc[0, "raw_mean_cents"] * n0 + got.loc[1, "raw_mean_cents"] * n1) / (n0 + n1)
    pooled_adj = (
        got.loc[0, "cuped_mean_cents"] * n0 + got.loc[1, "cuped_mean_cents"] * n1
    ) / (n0 + n1)
    assert math.isclose(pooled_raw, pooled_adj, rel_tol=1e-6)


def test_zipf_fit_matches_numpy_polyfit(spark, sf_dir):
    got = q_zipf_powerlaw_fit(spark, sf_dir).toPandas().iloc[0]
    freq = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .count()
        .toPandas()
        .sort_values(["count", "l_partkey"], ascending=[False, True])
    )
    lr = np.log(np.arange(1, len(freq) + 1))
    lf = np.log(freq["count"].to_numpy(float))
    slope, intercept = np.polyfit(lr, lf, 1)
    assert int(got.n_parts) == len(freq)
    assert math.isclose(float(got.zipf_slope), slope, abs_tol=1e-4)
    assert math.isclose(float(got.ln_intercept), intercept, abs_tol=1e-4)


def test_negative_samples_never_hit_positives_and_reproduce(spark, sf_dir):
    got = q_negative_sampling(spark, sf_dir).toPandas()
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").toPandas()
    purchased = set(
        map(
            tuple,
            orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")[
                ["o_custkey", "l_partkey"]
            ].values,
        )
    )
    n_parts = int(read_table(spark, sf_dir, "part").agg(F.max("p_partkey")).collect()[0][0]) + 1
    for r in got.itertuples():
        # reproducibility: the sample IS the hash value
        assert r.neg_part == _bucket_py(int(r.cust), int(r.slot), n_parts)
        # no positive leaks through the anti-join
        assert (r.cust, r.neg_part) not in purchased
    # every purchasing customer appears with <= 5 slots
    per = got.groupby("cust")["slot"].count()
    assert (per <= 5).all()
