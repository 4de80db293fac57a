"""Learned quality filtering — the fastText-style classifier step of
CCNet / LLaMA / RedPajama / DCLM data pipelines: train a linear
classifier on weak labels (curated-reference docs vs random web), then
keep documents the model scores as reference-like.

Spark-first shape: featurization is `HashingTF` over the tokenized
text (map-side, fixed-width feature space — the same hashing trick
fastText uses, no vocabulary state to ship), training is MLlib
`LogisticRegression` (distributed treeAggregate L-BFGS), scoring is a
broadcast of the fitted coefficient vector applied map-side. At 100 TB
the only data movement is the gradient treeAggregate during fit;
scoring shuffles nothing.

Gate note: the synthetic `documents` fixture is random word soup with
no learnable document-level signal (measured: lang and perplexity
head/tail both give test AUC ~0.5), so this operator carries pytest
evidence on a separable corpus rather than a vacuous gate entry —
the same evidence class as the registry/metric ML components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QC_NUM_FEATURES = 4096
QC_KEEP_PROB = 0.5


def featurize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenize + hash to a fixed QC_NUM_FEATURES-wide sparse vector.
    Map-only; the feature space never grows with the vocabulary."""
    from pyspark.ml.feature import HashingTF

    words = docs.withColumn(
        "__words",
        F.expr(f"filter(split(lower({text_col}), ' '), w -> length(w) >= 1)"),
    )
    tf = HashingTF(
        inputCol="__words", outputCol="features", numFeatures=QC_NUM_FEATURES
    )
    return tf.transform(words).drop("__words")


def train_quality_classifier(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    max_iter: int = 30,
    reg_param: float = 0.01,
):
    """Fit the reference-vs-random classifier. `label_col` is the weak
    label (1.0 = curated/reference-like). Returns the fitted MLlib
    model; L-BFGS over commutative treeAggregate sums is deterministic
    for a given dataset."""
    from pyspark.ml.classification import LogisticRegression

    feat = featurize(docs, text_col).withColumn(
        "label", F.col(label_col).cast("double")
    )
    from propensity_spark.ml.training import _strip_training_summaries

    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param)
    model = lr.fit(feat)
    # Spark 4.1 closure-safety: see _strip_training_summaries — without
    # this, evaluate() dies if any Observation ran earlier in the session.
    _strip_training_summaries(model)
    return model


def score_quality(model, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Score docs with a fitted classifier: appends `quality_prob`
    (P(reference-like)) and `quality_keep` (prob > QC_KEEP_PROB).
    Coefficients broadcast; scoring is map-side."""
    from pyspark.ml.functions import vector_to_array

    pred = model.transform(featurize(docs, text_col))
    return (
        pred.withColumn(
            "quality_prob", vector_to_array("probability").getItem(1)
        )
        .withColumn(
            "quality_keep", (F.col("quality_prob") > QC_KEEP_PROB).cast("int")
        )
        .drop("features", "rawPrediction", "probability", "prediction")
    )


def evaluate_quality_classifier(
    model, docs: DataFrame, label_col: str = "label", text_col: str = "text"
):
    """AUC + accuracy of the classifier on a labeled frame (both
    computed distributed via MLlib evaluators / one agg). `text_col`
    must match the column the model was trained on (same contract as
    train_quality_classifier / score_quality)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    feat = featurize(docs, text_col).withColumn(
        "label", F.col(label_col).cast("double")
    )
    pred = model.transform(feat)
    auc = BinaryClassificationEvaluator(metricName="areaUnderROC").evaluate(pred)
    acc = pred.selectExpr(
        "avg(cast(prediction = label as double)) AS a"
    ).first()["a"]
    return {"auc": float(auc), "accuracy": float(acc)}
