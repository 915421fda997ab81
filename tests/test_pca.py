"""PCA fit/project: distributed moments + driver eigensolve."""

import numpy as np
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import pca_fit, pca_project
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_pca_fit_matches_numpy(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mean, comps = pca_fit(emb, "v", dim=64, k=4)
    X = np.array([r["v"] for r in emb.collect()], dtype=np.float64)
    np.testing.assert_allclose(mean, X.mean(0), rtol=1e-8)
    # orthonormal components
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    # projected variances == top eigenvalues of the sample covariance,
    # in descending order
    cov = np.cov(X.T, bias=True)
    eig = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    proj_var = ((X - X.mean(0)) @ comps.T).var(0)
    np.testing.assert_allclose(np.sort(proj_var)[::-1], eig, rtol=1e-6)
    assert all(proj_var[i] >= proj_var[i + 1] - 1e-12 for i in range(3))


def test_pca_project_shape_and_values(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mean, comps = pca_fit(emb, "v", dim=64, k=3)
    out = pca_project(emb, mean, comps, "vec_id", "v")
    rows = {r["vec_id"]: r["pca"] for r in out.collect()}
    X = {r["vec_id"]: np.asarray(r["v"]) for r in emb.collect()}
    some = sorted(rows)[:5]
    for vid in some:
        expected = comps @ (X[vid] - mean)
        np.testing.assert_allclose(rows[vid], expected, rtol=1e-9)
