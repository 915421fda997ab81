"""Definition-level checks for the ext46 batch."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext46 import (
    q_cohens_kappa,
    q_youden_j_threshold,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _preds(docs: pd.DataFrame):
    out = []
    for r in docs.itertuples():
        toks = r.text.split(" ")
        h_en = sum(t in ("the", "a", "fast") for t in toks)
        h_es = sum(t in ("data", "row") for t in toks)
        h_zh = sum(t in ("table", "join") for t in toks)
        p = "en" if h_en >= h_es and h_en >= h_zh else ("es" if h_es >= h_zh else "zh")
        out.append((r.lang, p))
    return out


def test_kappa_matches_literal_margins(spark, sf_dir):
    got = q_cohens_kappa(spark, sf_dir).toPandas().iloc[0]
    docs = read_table(spark, sf_dir, "documents").select("lang", "text").toPandas()
    preds = _preds(docs)
    n = len(preds)
    agree = sum(1 for lg, p in preds if lg == p)
    rows = Counter(lg for lg, _ in preds)
    cols = Counter(p for _, p in preds)
    pe_num = sum(rows[c] * cols.get(c, 0) for c in set(rows) | set(cols))
    po, pe = agree / n, pe_num / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert (int(got.n), int(got.agree)) == (n, agree)
    assert math.isclose(float(got.po), po, abs_tol=1e-5)
    assert math.isclose(float(got.pe), pe, abs_tol=1e-5)
    assert math.isclose(float(got.kappa), kappa, abs_tol=1e-5)
    assert float(got.kappa) <= 1.0


def test_youden_is_the_true_roc_argmax(spark, sf_dir):
    got = q_youden_j_threshold(spark, sf_dir).toPandas().iloc[0]
    ev = read_table(spark, sf_dir, "events").select("event_type", "value").toPandas()
    ev["v"] = np.round(ev.value * 100).astype("int64")
    ev["y"] = (ev.event_type == "purchase").astype(int)
    pos, neg = int(ev.y.sum()), int((1 - ev.y).sum())
    best = None
    for t in sorted(ev.v.unique()):
        tp = int(ev[(ev.v >= t)].y.sum())
        fp = int((ev.v >= t).sum()) - tp
        j = (1000000000 * tp) // pos - (1000000000 * fp) // neg
        key = (-j, t)
        if best is None or key < best[0]:
            best = (key, t, tp, fp, j)
    _, t, tp, fp, j = best
    assert int(got.threshold_cents) == t
    assert (int(got.tp), int(got.fp), int(got.j_e9)) == (tp, fp, j)
    # J at the chosen point beats the trivial all-positive threshold
    assert int(got.j_e9) >= 0
