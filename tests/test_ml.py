"""MLlib classifier over the rule-labeled events table: the learned tree
must recover the threshold structure well enough to beat chance by a wide
margin, and model scoring must preserve the input's identity columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.plans.ml import (
    score_with_model,
    train_fraud_classifier,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import q_fraud_score_events


@pytest.fixture(scope="module")
def scored(spark, sf_dir):
    # Rule-labeled replay output: features (dist, dt, speed) + status.
    return q_fraud_score_events(spark, sf_dir).cache()


def test_tree_learns_rule_structure(scored):
    trained = train_fraud_classifier(
        scored, feature_cols=("dist_km", "dt_seconds", "speed_kms"), algorithm="tree"
    )
    # The label is a deterministic OR of feature thresholds (plus two
    # features we deliberately withhold: k and value), so a depth-8 tree
    # should get most of the way there.
    assert trained.metrics["auc"] > 0.80
    assert trained.metrics["accuracy"] > 0.80


def test_logistic_trains_and_evaluates(scored):
    trained = train_fraud_classifier(
        scored, feature_cols=("dist_km", "dt_seconds", "speed_kms"), algorithm="logistic"
    )
    assert 0.5 < trained.metrics["auc"] <= 1.0


def test_gbt_trains_and_beats_chance(scored):
    trained = train_fraud_classifier(
        scored.limit(2000),
        feature_cols=("dist_km", "dt_seconds", "speed_kms"),
        algorithm="gbt",
    )
    assert trained.metrics["auc"] > 0.75


def test_model_save_load_roundtrip(scored, tmp_path):
    # production path: batch layer trains and persists; scorer loads
    from pyspark.ml import PipelineModel

    trained = train_fraud_classifier(
        scored, feature_cols=("dist_km", "dt_seconds", "speed_kms"), algorithm="tree"
    )
    path = str(tmp_path / "model")
    trained.model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)

    sample = scored.limit(50)
    orig = trained.model.transform(
        sample.selectExpr(
            "coalesce(dist_km, -1.0) AS dist_km",
            "coalesce(dt_seconds, -1.0) AS dt_seconds",
            "coalesce(speed_kms, -1.0) AS speed_kms",
        )
    ).select("prediction").collect()
    again = reloaded.transform(
        sample.selectExpr(
            "coalesce(dist_km, -1.0) AS dist_km",
            "coalesce(dt_seconds, -1.0) AS dt_seconds",
            "coalesce(speed_kms, -1.0) AS speed_kms",
        )
    ).select("prediction").collect()
    assert [r.prediction for r in orig] == [r.prediction for r in again]


def test_score_with_model_keeps_identity_columns(scored):
    trained = train_fraud_classifier(
        scored, feature_cols=("dist_km", "dt_seconds", "speed_kms"), algorithm="tree"
    )
    out = score_with_model(trained, scored)
    assert "event_id" in out.columns and "prediction" in out.columns
    assert out.count() == scored.count()
    # predictions are 0/1 doubles
    vals = {r.prediction for r in out.select("prediction").distinct().collect()}
    assert vals <= {0.0, 1.0}
