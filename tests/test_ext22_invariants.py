"""Definition-level re-derivations for the ext22 batch (RANSAC, BH
FDR, k-anonymity, Fano): each distributed formulation is checked
against the LITERAL definition in plain Python at test scale."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext22 import (
    _BH_ALPHA,
    _N_MODELS,
    q_bh_fdr_screen,
    q_fano_burstiness,
    q_k_anonymity_audit,
    q_ransac_trend_fit,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_ransac_matches_python_consensus(spark, sf_dir):
    import datetime as dt

    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("y"))
        .collect()
    )
    series = sorted((r["d"], int(r["y"])) for r in rows)
    epoch = dt.date(1970, 1, 1)
    pts = [((d - epoch).days, y) for d, y in series]
    n = len(pts)
    thr = 0.1 * sum(y for _, y in pts) / n
    best = (-1, None, None)
    for m in range(1, _N_MODELS + 1):
        x1, y1 = pts[m - 1]
        x2, y2 = pts[m - 1 + n // 2]
        slope = (y2 - y1) / (x2 - x1)
        inl = sum(1 for x, y in pts if abs(y - (y1 + slope * (x - x1))) <= thr)
        if inl > best[0]:  # strict >: smallest model_id wins ties
            best = (inl, m, slope)
    row = q_ransac_trend_fit(spark, sf_dir).collect()[0]
    assert row["model_id"] == best[1]
    assert row["n_inliers"] == best[0]
    assert math.isclose(row["slope_cents_per_day"], best[2], abs_tol=1e-6)


def test_bh_stepup_matches_python(spark, sf_dir):
    rows = q_bh_fdr_screen(spark, sf_dir).collect()
    assert len(rows) == 25
    # re-run the step-up on the reported (already e8-rounded) p-values
    srt = sorted(rows, key=lambda r: (r["p_e8"], r["nation"]))
    m = len(srt)
    kmax = 0
    for i, r in enumerate(srt, start=1):
        assert r["bh_rank"] == i, "rank must follow (p, nation) order"
        if r["p_e8"] / 1e8 <= _BH_ALPHA * i / m:
            kmax = i
    for i, r in enumerate(srt, start=1):
        assert r["rejected"] == (1 if i <= kmax else 0)
    # z and p must agree with a direct Python evaluation of the shared
    # formulation (pooled-rate two-proportion z + A&S 26.2.17 tail)
    gu = sum(r["n_urgent"] for r in rows)
    gn = sum(r["n_orders"] for r in rows)
    g = gu / gn
    for r in rows:
        z = (r["n_urgent"] / r["n_orders"] - g) / math.sqrt(g * (1 - g) / r["n_orders"])
        assert math.isclose(r["z_score"], round(z, 6), abs_tol=1.1e-6)
        t = 1 / (1 + 0.2316419 * abs(z))
        tail = (
            math.exp(-0.5 * z * z)
            * 0.3989422804014327
            * (
                0.319381530 * t
                - 0.356563782 * t**2
                + 1.781477937 * t**3
                - 1.821255978 * t**4
                + 1.330274429 * t**5
            )
        )
        assert abs(r["p_e8"] - 2 * tail * 1e8) <= 1.0


def test_bh_tail_approximates_normal_cdf():
    """A&S 26.2.17 is within 7.5e-8 of the true upper tail -- sanity
    that the shared polynomial is the statistic it claims to be."""
    for z in (0.1, 0.5, 1.0, 1.96, 2.58, 3.5):
        t = 1 / (1 + 0.2316419 * z)
        tail = (
            math.exp(-0.5 * z * z)
            * 0.3989422804014327
            * (
                0.319381530 * t
                - 0.356563782 * t**2
                + 1.781477937 * t**3
                - 1.821255978 * t**4
                + 1.330274429 * t**5
            )
        )
        true = 0.5 * math.erfc(z / math.sqrt(2))
        assert abs(tail - true) < 7.5e-8


def test_k_anonymity_matches_python(spark, sf_dir):
    classes = defaultdict(int)
    for r in read_table(spark, sf_dir, "customer").collect():
        classes[
            (r["c_nationkey"], r["c_mktsegment"], math.floor(r["c_acctbal"] / 1000))
        ] += 1
    row = q_k_anonymity_audit(spark, sf_dir).collect()[0]
    assert row["n_classes"] == len(classes)
    assert row["min_class_size"] == min(classes.values())
    assert row["n_risky_classes"] == sum(1 for v in classes.values() if v < 5)
    assert row["n_risky_rows"] == sum(v for v in classes.values() if v < 5)
    assert row["n_rows"] == sum(classes.values())


def test_fano_matches_python_with_zero_days(spark, sf_dir):
    import datetime as dt

    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .collect()
    )
    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(30)]
    per_user = defaultdict(lambda: defaultdict(int))
    for r in ev:
        per_user[r["user_id"]][r["d"]] += 1
    got = {r["user_id"]: r for r in q_fano_burstiness(spark, sf_dir).collect()}
    assert set(got) == set(per_user)
    for u, by_day in per_user.items():
        counts = [by_day.get(d, 0) for d in days]
        nd, s1 = len(counts), sum(counts)
        mean = s1 / nd
        var = sum((c - mean) ** 2 for c in counts) / nd
        r = got[u]
        assert r["n_events"] == s1
        assert math.isclose(r["fano"], var / mean, abs_tol=2e-6)
