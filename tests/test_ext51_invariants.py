"""Definition-level checks for the ext51 batch."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext51 import (
    q_lexical_dispersion,
    q_mediation_effect,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_mediation_matches_numpy_lstsq_and_lsem_identity(spark, sf_dir):
    got = q_mediation_effect(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag").toPandas()
    bad = set(li[li.l_returnflag == "R"].l_orderkey)
    x = o.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(float).values
    m = (np.round(o.o_totalprice * 100).astype("int64") // 100).astype(float).values
    y = o.o_orderkey.isin(bad).astype(float).values
    a = np.cov(x, m, bias=True)[0, 1] / np.var(x)
    X = np.column_stack([np.ones_like(x), x, m])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    total = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    assert int(got.n_orders) == len(o)
    assert math.isclose(float(got.a_path), a, abs_tol=1e-4)
    assert math.isclose(float(got.b_path), beta[2], abs_tol=1e-6)
    assert math.isclose(float(got.indirect_effect), a * beta[2], abs_tol=1e-5)
    assert math.isclose(float(got.total_effect), total, abs_tol=1e-5)
    # LSEM identity: total = direct + indirect, i.e. the X coefficient
    # in the full model equals total - a*b
    assert math.isclose(total - a * beta[2], beta[1], abs_tol=1e-6)


def test_dispersion_matches_literal_cv(spark, sf_dir):
    got = q_lexical_dispersion(spark, sf_dir).toPandas().set_index("tok")
    docs = read_table(spark, sf_dir, "documents").select("source", "text").toPandas()
    tok_rows = []
    for r in docs.itertuples():
        tok_rows.extend((r.source, t) for t in r.text.split(" "))
    cnt = Counter(t for _, t in tok_rows)
    top = sorted(cnt, key=lambda t: (-cnt[t], t))[:10]
    stot = Counter(s for s, _ in tok_rows)
    k = len(stot)
    per = Counter(tok_rows)
    for tok in top:
        freqs = [
            (1000000000 * per.get((s, tok), 0)) // stot[s] for s in stot
        ]
        s1, s2 = sum(freqs), sum(v * v for v in freqs)
        cv = math.sqrt(s2 * k / (s1 * s1) - 1)
        d_lit = 1 - cv / math.sqrt(k - 1)
        row = got.loc[tok]
        assert int(row.n_sources) == k
        assert math.isclose(float(row.juilland_d), d_lit, abs_tol=1e-5)
        assert 0.0 <= float(row.juilland_d) <= 1.0
