"""Definition-level check for the ext58 batch."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext58 import q_mcnemar_test
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_mcnemar_matches_literal_discordant_pairs(spark, sf_dir):
    got = q_mcnemar_test(spark, sf_dir).toPandas().iloc[0]
    docs = read_table(spark, sf_dir, "documents").select("lang", "text").toPandas()
    maj = sorted(Counter(docs.lang).items(), key=lambda t: (-t[1], t[0]))[0][0]
    b = c = 0
    for r in docs.itertuples():
        toks = r.text.split(" ")
        h_en = sum(t in ("the", "a", "fast") for t in toks)
        h_es = sum(t in ("data", "row") for t in toks)
        h_zh = sum(t in ("table", "join") for t in toks)
        p = "en" if h_en >= h_es and h_en >= h_zh else ("es" if h_es >= h_zh else "zh")
        h_right, b_right = p == r.lang, maj == r.lang
        if h_right and not b_right:
            b += 1
        elif b_right and not h_right:
            c += 1
    assert int(got.n_docs) == len(docs)
    assert (int(got.b_discordant), int(got.c_discordant)) == (b, c)
    if b + c:
        chi2 = (abs(b - c) - 1) ** 2 / (b + c)
        assert math.isclose(float(got.chi2), chi2, abs_tol=1e-6)
    else:
        assert pd.isna(got.chi2)
