"""MLlib fraud classification on the scored master table.

The reference stops at three hand-written boolean rules
(FinFraudGuard.java:82-83); the labeled history table those rules produce
(status GENUINE/FRAUD[ULENT]) is exactly a training set, so the engine
adds the natural next step: learn a classifier over the rule inputs
(amount, credit score, ucl headroom, distance, dt, speed) and score new
transactions with it.

Everything is a lazy ML Pipeline: assembler + classifier fit on
DataFrames, model.transform for scoring -- distributed end to end, no
driver-side matrices. At 100 TB you fit on a sample or use
miniBatchFraction; transform streams through executors either way.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_FEATURES = ("amount", "dist_km", "dt_seconds", "speed_kms", "score", "ucl")


def make_training_frame(
    scored: DataFrame,
    feature_cols: tuple[str, ...] = DEFAULT_FEATURES,
    status_col: str = "status",
    fraud_value: str = "FRAUD",
) -> DataFrame:
    """Label + null-imputed features from a scored transactions table.

    NULL features (new card, missing zip, first event) are imputed with
    -1.0 -- a value outside every legitimate feature range, so tree
    splits can isolate 'missing' and linear models see a consistent
    sentinel.
    """
    present = [c for c in feature_cols if c in scored.columns]
    out = scored.select(
        *[F.coalesce(F.col(c).cast("double"), F.lit(-1.0)).alias(c) for c in present],
        (F.upper(F.col(status_col)) == fraud_value).cast("double").alias("label"),
    )
    return out


@dataclass
class TrainedModel:
    model: object  # fitted pyspark.ml PipelineModel
    feature_cols: tuple[str, ...]
    metrics: dict[str, float]


def train_fraud_classifier(
    scored: DataFrame,
    feature_cols: tuple[str, ...] = DEFAULT_FEATURES,
    algorithm: str = "tree",
    test_fraction: float = 0.25,
    seed: int = 42,
) -> TrainedModel:
    """Fit a classifier on the labeled master table; returns the fitted
    pipeline plus held-out metrics (areaUnderROC, accuracy).

    algorithm: 'tree' (DecisionTree -- mirrors the rules' threshold
    structure), 'logistic', or 'gbt'.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import (
        DecisionTreeClassifier,
        GBTClassifier,
        LogisticRegression,
    )
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    data = make_training_frame(scored, feature_cols)
    present = [c for c in data.columns if c != "label"]
    assembler = VectorAssembler(inputCols=present, outputCol="features")
    clf = {
        "tree": DecisionTreeClassifier(maxDepth=8, seed=seed),
        "logistic": LogisticRegression(maxIter=50),
        "gbt": GBTClassifier(maxIter=20, maxDepth=5, seed=seed),
    }[algorithm]
    pipeline = Pipeline(stages=[assembler, clf])

    train, test = data.randomSplit([1 - test_fraction, test_fraction], seed=seed)
    model = pipeline.fit(train)
    predictions = model.transform(test)

    auc = BinaryClassificationEvaluator(metricName="areaUnderROC").evaluate(predictions)
    accuracy = predictions.filter(F.col("prediction") == F.col("label")).count() / max(
        predictions.count(), 1
    )
    return TrainedModel(model=model, feature_cols=tuple(present),
                        metrics={"auc": auc, "accuracy": accuracy})


def score_with_model(trained: TrainedModel, df: DataFrame) -> DataFrame:
    """Attach model predictions to a (possibly unlabeled) frame with the
    same feature columns."""
    feats = df.select(
        "*",
        *[
            F.coalesce(F.col(c).cast("double"), F.lit(-1.0)).alias(f"_f_{c}")
            for c in trained.feature_cols
        ],
    )
    renamed = feats
    for c in trained.feature_cols:
        renamed = renamed.withColumnRenamed(c, f"_orig_{c}").withColumnRenamed(f"_f_{c}", c)
    out = trained.model.transform(renamed)
    keep = [c for c in df.columns if c not in trained.feature_cols]
    restore = [F.col(f"_orig_{c}").alias(c) for c in trained.feature_cols]
    return out.select(*keep, *restore, "prediction", "probability")
