"""Definition-level checks for the ext52 batch."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext52 import (
    q_icc_segments,
    q_token_burstiness,
    q_wilson_score_ci,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_Z = 1.959964


def test_wilson_matches_literal_and_contains_p(spark, sf_dir):
    got = q_wilson_score_ci(spark, sf_dir).toPandas().set_index("event_type")
    ev = read_table(spark, sf_dir, "events").select("event_type", "value").toPandas()
    for et, g in ev.groupby("event_type"):
        n = len(g)
        k = int((g.value > 150).sum())
        p = k / n
        denom = 1 + _Z * _Z / n
        center = (p + _Z * _Z / (2 * n)) / denom
        half = _Z * math.sqrt(p * (1 - p) / n + _Z * _Z / (4 * n * n)) / denom
        row = got.loc[et]
        assert (int(row.n), int(row.k)) == (n, k)
        assert math.isclose(float(row.lo), center - half, abs_tol=1e-5)
        assert math.isclose(float(row.hi), center + half, abs_tol=1e-5)
        # the Wilson interval always contains the point estimate
        assert float(row.lo) <= p <= float(row.hi)


def test_icc_matches_literal_variance_components(spark, sf_dir):
    got = q_icc_segments(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").toPandas()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["v"] = np.round(df.o_totalprice * 100).astype("int64") // 100
    groups = [g.v.values.astype(float) for _, g in df.groupby("c_mktsegment")]
    grand = np.concatenate(groups)
    gm = grand.mean()
    n, k = len(grand), len(groups)
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    msb, msw = ssb / (k - 1), ssw / (n - k)
    n0 = (n - sum(len(g) ** 2 for g in groups) / n) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    assert (int(got.n_total), int(got.n_groups)) == (n, k)
    assert math.isclose(float(got.icc), icc, abs_tol=1e-5)
    assert -1.0 <= float(got.icc) <= 1.0


def test_burstiness_matches_literal_doc_frequencies(spark, sf_dir):
    got = q_token_burstiness(spark, sf_dir).toPandas().set_index("tok")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    per: Counter = Counter()
    for r in docs.itertuples():
        for t, c in Counter(r.text.split(" ")).items():
            per[(t, r.doc_id)] = c
    totals: Counter = Counter()
    for (t, _), c in per.items():
        totals[t] += c
    top = sorted(totals, key=lambda t: (-totals[t], t))[:20]
    assert set(got.index) == set(top)
    for t in top:
        occs = [c for (tt, _), c in per.items() if tt == t]
        df1 = len(occs)
        df2 = sum(1 for c in occs if c >= 2)
        row = got.loc[t]
        assert (int(row.df1), int(row.df2), int(row.total_occ)) == (
            df1,
            df2,
            sum(occs),
        )
        assert int(row.burstiness_ppm) == (1000000 * df2) // df1
        assert int(row.mean_occ_e3) == (1000 * sum(occs)) // df1
