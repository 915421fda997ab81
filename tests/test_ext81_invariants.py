"""Definition-level checks for ext81: numpy linear-algebra
re-derivations (np.linalg ridge solve, literal NB scoring, Mahalanobis
via inv covariance, partial correlation from the correlation matrix)."""

from __future__ import annotations

from collections import Counter, defaultdict
from math import log

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext81 import (
    q_mahalanobis_outliers_2d,
    q_naive_bayes_langid,
    q_partial_correlation_vif,
    q_ridge_regression_2d,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _features(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).toPandas()
    li["q"] = li.l_quantity.astype("int64")
    g = li.groupby("l_orderkey").agg(x1=("q", "size"), x2=("q", "sum"))
    j = o.merge(g, left_on="o_orderkey", right_index=True)
    y = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    return (
        j.o_orderkey.to_numpy(),
        j.x1.to_numpy().astype("int64"),
        j.x2.to_numpy().astype("int64"),
        y,
    )


def test_ridge_definition(spark, sf_dir):
    row = q_ridge_regression_2d(spark, sf_dir).collect()[0]
    _, x1, x2, y = _features(spark, sf_dir)
    X = np.column_stack([x1, x2]).astype("float64")
    yv = y.astype("float64")
    n = len(yv)
    assert row["n_orders"] == n
    Xc = X - X.mean(axis=0)
    yc = yv - yv.mean()
    xtx = Xc.T @ Xc
    lam = np.diag(np.diag(xtx)) * 0.01
    beta = np.linalg.solve(xtx + lam, Xc.T @ yc)
    assert abs(row["beta_per_line_dollars"] - beta[0] / 100) < 1e-2
    assert abs(row["beta_per_unit_dollars"] - beta[1] / 100) < 1e-2
    intercept = yv.mean() - beta @ X.mean(axis=0)
    assert abs(row["intercept_dollars"] - intercept / 100) < 0.5
    ve = (beta @ (Xc.T @ yc)) / (yc @ yc)
    assert abs(row["variance_explained"] - ve) < 1e-4
    assert 0.0 <= row["variance_explained"] <= 1.0


def test_naive_bayes_definition(spark, sf_dir):
    rows = {r["true_lang"]: r for r in q_naive_bayes_langid(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).toPandas()
    wc = defaultdict(Counter)
    ntok = Counter()
    vocab = set()
    toks_by_doc = []
    for r in docs.itertuples():
        ts = r.text.split(" ")
        toks_by_doc.append((r.doc_id, r.lang, ts))
        wc[r.lang].update(ts)
        ntok[r.lang] += len(ts)
        vocab.update(ts)
    v = len(vocab)
    langs = sorted(wc)
    correct = Counter()
    total = Counter()
    for _, lang, ts in toks_by_doc:
        best, best_score = None, None
        for cand in langs:
            s = 0
            for t in ts:
                c = wc[cand][t]
                if c:  # unseen-in-class tokens don't join
                    s += int(np.floor(1e9 * log((c + 1) / (ntok[cand] + v)) + 0.5))
            if best_score is None or s > best_score or (
                s == best_score and cand < best
            ):
                best, best_score = cand, s
        total[lang] += 1
        correct[lang] += int(best == lang)
    assert sorted(rows) == langs
    for lang in langs:
        assert rows[lang]["n_docs"] == total[lang]
        assert rows[lang]["n_correct"] == correct[lang]
        assert abs(rows[lang]["accuracy"] - correct[lang] / total[lang]) < 1e-6


def test_mahalanobis_definition(spark, sf_dir):
    rows = q_mahalanobis_outliers_2d(spark, sf_dir).collect()
    ok, x1, x2, _ = _features(spark, sf_dir)
    X = np.column_stack([x1, x2]).astype("float64")
    mu = X.mean(axis=0)
    cov = np.cov(X.T, bias=True)
    inv = np.linalg.inv(cov)
    d = X - mu
    d2 = np.einsum("ij,jk,ik->i", d, inv, d)
    order = np.lexsort((ok, -d2))[:5]
    assert len(rows) == 5
    for r, i in zip(rows, order):
        assert r["orderkey"] == ok[i]
        assert r["n_lines"] == x1[i] and r["total_qty"] == x2[i]
        assert abs(r["mahalanobis_sq"] - d2[i]) < 1e-3
    # mean d^2 over ALL points is exactly the dimension (2)
    assert abs(d2.mean() - 2.0) < 1e-9


def test_partial_correlation_definition(spark, sf_dir):
    row = q_partial_correlation_vif(spark, sf_dir).collect()[0]
    _, x1, x2, y = _features(spark, sf_dir)
    M = np.corrcoef(np.vstack([x1, x2, y]).astype("float64"))
    r12, r1y, r2y = M[0, 1], M[0, 2], M[1, 2]
    assert abs(row["r_lines_qty"] - r12) < 1e-5
    assert abs(row["r_lines_total"] - r1y) < 1e-5
    assert abs(row["r_qty_total"] - r2y) < 1e-5
    pr = (r1y - r12 * r2y) / np.sqrt((1 - r12**2) * (1 - r2y**2))
    assert abs(row["partial_r_lines_total_given_qty"] - pr) < 1e-5
    assert abs(row["vif"] - 1 / (1 - r12**2)) < 1e-3
    assert row["vif"] >= 1.0
