"""Definition-level checks for the ext45 batch."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext45 import (
    q_quartile_mobility_matrix,
    q_wilcoxon_signed_rank,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _cents(p: pd.Series) -> pd.Series:
    return np.round(p * 100).astype("int64")


def test_wilcoxon_matches_scipy_style_ranks(spark, sf_dir):
    got = q_wilcoxon_signed_rank(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = _cents(o.o_totalprice)
    days = o.groupby("o_orderdate").c.sum().sort_index().values
    diffs = [int(b) - int(a) for a, b in zip(days, days[364:]) if b != a]
    s = pd.Series([abs(d) for d in diffs])
    ranks = s.rank(method="average")
    w_plus = float(sum(r for r, d in zip(ranks, diffs) if d > 0))
    n = len(diffs)
    ties = s.value_counts()
    tie_term = float(((ties**3) - ties).sum())
    var = n * (n + 1) * (2 * n + 1) / 24 - tie_term / 48
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
    assert int(got.n_pairs) == n
    assert int(got.w_plus) == int(w_plus)  # doubled-rank sums are exact
    assert math.isclose(float(got.z_score), z, abs_tol=1e-5)


def test_mobility_matrix_matches_literal_quartiles(spark, sf_dir):
    got = q_quartile_mobility_matrix(spark, sf_dir).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    o["cents"] = _cents(o.o_totalprice)
    o["y"] = o.o_orderdate.dt.year

    def quartiles(year):
        sp = o[o.y == year].groupby("o_custkey").cents.sum()
        n = len(sp)
        # spine semantics: ties share a quartile via cumulative counts
        spine = sp.value_counts().sort_index()
        cc = spine.cumsum()
        qmap = {}
        for v, c in cc.items():
            qmap[v] = 1 if 4 * c <= n else (2 if 4 * c <= 2 * n else (3 if 4 * c <= 3 * n else 4))
        return {ck: qmap[v] for ck, v in sp.items()}

    qa, qb = quartiles(1996), quartiles(1997)
    both = set(qa) & set(qb)
    cells: dict = {}
    for ck in both:
        cells[(qa[ck], qb[ck])] = cells.get((qa[ck], qb[ck]), 0) + 1
    have = {(r.q_1996, r.q_1997): int(r.n_customers) for r in got.itertuples()}
    assert have == cells
    # row shares sum to ~1e6 per origin quartile (floor-division slack)
    for q, g in got.groupby("q_1996"):
        row_n = g.n_customers.sum()
        for r in g.itertuples():
            assert int(r.row_share_ppm) == (1000000 * int(r.n_customers)) // row_n
