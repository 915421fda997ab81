"""Definition-level checks for the ext54 batch."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext54 import (
    q_rich_club_coefficient,
    q_rolling_origin_backtest,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_rich_club_matches_literal_subgraphs(spark, sf_dir):
    got = q_rich_club_coefficient(spark, sf_dir).toPandas().set_index("k")
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8, shingle_w=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2).toPandas()
    edges = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b) if a != b}
    deg: dict = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    for k in (1, 2, 3):
        rich = {n for n, d in deg.items() if d > k}
        e_rich = sum(1 for a, b in edges if a in rich and b in rich)
        row = got.loc[k]
        assert int(row.n_rich) == len(rich)
        assert int(row.e_rich) == e_rich
        if len(rich) >= 2:
            assert int(row.phi_ppm) == (2000000 * e_rich) // (len(rich) * (len(rich) - 1))
        else:
            assert pd.isna(row.phi_ppm)


def test_rolling_origin_matches_literal_fits(spark, sf_dir):
    got = q_rolling_origin_backtest(spark, sf_dir).toPandas().set_index("cutoff")
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = np.round(o.o_totalprice * 100).astype("int64")
    days = o.groupby("o_orderdate").c.sum().sort_index()
    x_all = (days.index - pd.Timestamp("1995-01-01")).days.values.astype(float)
    y_all = days.values.astype(float)
    for cut in ("1997-01-01", "1998-01-01", "1999-01-01", "2000-01-01"):
        cutoff = pd.Timestamp(cut)
        tr = days.index < cutoff
        te = (days.index >= cutoff) & (days.index < cutoff + pd.Timedelta(days=365)) & (
            days.values > 0
        )
        n = int(tr.sum())
        sx, sy = x_all[tr].sum(), y_all[tr].sum()
        sxy = (x_all[tr] * y_all[tr]).sum()
        sxx = (x_all[tr] * x_all[tr]).sum()
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        apes = [
            round(1e6 * abs(y - (a + b * x)) / y)
            for x, y in zip(x_all[te], y_all[te])
        ]
        row = got.loc[cut]
        assert int(row.n_train) == n
        assert int(row.n_test) == len(apes)
        assert int(row.mape_e6) == sum(apes) // len(apes)
    # expanding windows: training size strictly grows along the origins
    assert list(got.n_train) == sorted(got.n_train)
