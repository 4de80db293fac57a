"""Model training & batch scoring (04b_Task__Model_Training.py,
04c_Task__Propensity_Estimation.py) on MLlib.

The reference pulls each per-commodity training set to the driver as
pandas (04b:361 — the process-boundary anti-pattern at scale), tunes
XGBoost with hyperopt SparkTrials over broadcast pandas (04b:370-409),
and registers models in MLflow (04b:424-443). Spark-native rebuild:

* training set assembly = labels x three feature-table lookups (M1/J7)
  — stays distributed, no toPandas on unbounded data;
* class imbalance -> ``weightCol`` (M4) from the W1 ratio table instead
  of `scale_pos_weight`;
* tuning -> ``TrainValidationSplit`` + ``ParamGridBuilder`` (M3) with
  parallelism = sc.defaultParallelism, seeded splits (M2);
* registry -> a parquet model-manifest table + saved MLlib pipelines
  under a models/ directory with stage promotion (M6);
* scoring -> ``PipelineModel.transform`` (M7), probability flipped to
  the positive class like `1 - prediction` at 04c:185.

Per-commodity models keyed off the k-row control table: the loop is a
driver loop over <=10 rows (C4-sanctioned), each iteration a fully
distributed fit."""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propensity_spark.feature_store import DEFAULT_STORE, FeatureTable
from propensity_spark.operators.features import (
    q_commodity_features,
    q_household_commodity_features,
    q_household_features,
)
from propensity_spark.operators.relational import q_class_ratios, q_labels

SEED = 42


def build_training_set(
    spark: SparkSession,
    sf_dir: str,
    store_base: str,
    materialize: bool = True,
    day=None,
) -> tuple[DataFrame, list[str]]:
    """M1: labels + three exact-key feature lookups with rename
    prefixes (04b:195-217, 04b:353-358). Feature tables are written
    (day-stamped) to the feature store first, then looked up — the
    same round-trip the reference makes through the FS. Pass
    ``materialize=False`` when the store was already populated (the
    pipeline engineers features ONCE; training and scoring both look
    up from that store instead of recomputing)."""
    day = F.lit(str(day or "2024-01-01")).cast("date")
    hh = FeatureTable(spark, "household", ["household_key", "day"], store_base)
    cm = FeatureTable(spark, "commodity", ["commodity_desc", "day"], store_base)
    hc = FeatureTable(
        spark, "household_commodity", ["household_key", "commodity_desc", "day"], store_base
    )
    if materialize or not hc.exists():
        hh.create(q_household_features(spark, sf_dir).withColumn("day", day))
        cm.create(q_commodity_features(spark, sf_dir).withColumn("day", day))
        hc.create(q_household_commodity_features(spark, sf_dir).withColumn("day", day))

    labels = q_labels(spark, sf_dir).withColumn("day", day)
    ts = hh.lookup(labels, "household")
    ts = cm.lookup(ts, "commodity")
    ts = hc.lookup(ts, "household_commodity")
    feature_cols = [c for c in ts.columns if "__" in c]
    # left-outer lookups can miss (e.g. a household with no history):
    # reference fills 0.0 at feature build; we fill at assembly too.
    return ts.fillna(0.0, subset=feature_cols), feature_cols


def make_pipeline(feature_cols: list[str], tune: bool = False):
    """VectorAssembler -> weighted LogisticRegression; optional
    TrainValidationSplit grid (M3) when `tune`."""
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    lr = LogisticRegression(
        labelCol="purchased", weightCol="class_weight", featuresCol="features", maxIter=10
    )
    if not tune:
        return Pipeline(stages=[assembler, lr])
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.0, 0.01, 0.1])
        .addGrid(lr.elasticNetParam, [0.0, 0.5])
        .build()
    )
    tvs = TrainValidationSplit(
        estimator=Pipeline(stages=[assembler, lr]),
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(
            labelCol="purchased", metricName="areaUnderPR"  # M5: avg-precision analogue
        ),
        trainRatio=0.7,
        seed=SEED,
        parallelism=4,
    )
    return tvs


def train_commodity_models(
    spark: SparkSession,
    sf_dir: str,
    commodities: list[str] | int | None = None,
    tune: bool = False,
    store_base: str | None = None,
    models_base: str | None = None,
    materialize_features: bool = True,
    day=None,
) -> DataFrame:
    """Per-commodity training loop (04b:330-338) + manifest registry
    (M6). Returns the manifest DataFrame (commodity, model_path,
    metric_aupr, stage)."""
    store_base = store_base or str(DEFAULT_STORE / "training")
    # Models live UNDER the run's store dir: per-run isolation (two
    # concurrent runs never collide on model paths) and the caller's
    # cleanup of store_base removes them for free.
    models_base = models_base or str(Path(store_base) / "models")
    ts, feature_cols = build_training_set(
        spark, sf_dir, store_base, materialize=materialize_features, day=day
    )

    ratios = (
        q_class_ratios(spark, sf_dir)
        .where(F.col("purchased") == 1)
        .select("commodity_desc", F.col("class_ratio").alias("pos_ratio"))
    )
    ts = ts.join(F.broadcast(ratios), "commodity_desc", "leftouter").withColumn(
        "class_weight",
        F.when(F.col("purchased") == 1, 1.0 / F.greatest(F.col("pos_ratio"), F.lit(1e-6)))
        .otherwise(F.lit(1.0)),
    )
    if commodities is None:
        commodities = sorted(r[0] for r in ratios.select("commodity_desc").collect())
    elif isinstance(commodities, int):
        commodities = sorted(r[0] for r in ratios.select("commodity_desc").collect())[
            :commodities
        ]

    evaluator = BinaryClassificationEvaluator(labelCol="purchased", metricName="areaUnderPR")
    manifest_rows = []
    ts = ts.cache()  # C1: reused per-commodity
    try:
        n_train = ts.count()  # cached; cheap
        # Right-size the per-category slice: LR iterations pay per-task
        # overhead x partitions, so a 10^3-row slice on 32 partitions
        # spends 5x longer scheduling than computing. ~50k rows/partition;
        # at 100 TB slices are large and this leaves them distributed.
        parts = max(1, min(32, n_train // (len(commodities) * 50_000) + 1))
        for commodity in sorted(commodities):
            slice_df = ts.where(F.col("commodity_desc") == commodity).coalesce(parts)  # P6
            train, test = slice_df.randomSplit([0.8, 0.2], seed=SEED)  # M2
            model = make_pipeline(feature_cols, tune=tune).fit(train)
            pipeline_model = model.bestModel if tune else model
            aupr = float(evaluator.evaluate(pipeline_model.transform(test)))
            clean = commodity.replace("#", "_")
            path = str(Path(models_base) / clean)
            pipeline_model.write().overwrite().save(path)
            manifest_rows.append((commodity, clean, path, aupr, "Production"))
    finally:
        ts.unpersist()
    return spark.createDataFrame(
        manifest_rows, "commodity_desc string, commodity_clean string, "
        "model_path string, metric_aupr double, stage string"
    )


def score_batch(
    spark: SparkSession, ts: DataFrame, manifest: DataFrame
) -> DataFrame:
    """M7 batch scoring: per-commodity model transform over the
    feature-joined key batch; positive-class probability extracted
    from the probability vector (the `1 - prediction` flip, 04c:185)."""
    from pyspark.ml.functions import vector_to_array

    parts = []
    for row in manifest.collect():  # <=10 control rows (C4)
        model = PipelineModel.load(row["model_path"])
        batch = ts.where(F.col("commodity_desc") == row["commodity_desc"])
        scored = model.transform(batch).select(
            "household_key",
            "commodity_desc",
            vector_to_array("probability")[1].alias("prediction"),
        )
        parts.append(scored)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)  # §2.7: union instead of Delta-append loop
    return out


def q_train_score_propensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only gate query (ML outputs are seed-stable but not
    SQL-expressible): train 2 commodity models end-to-end through the
    feature store, score the universe, return (household, commodity,
    prediction-bucket) so minor float drift can't flake the check."""
    run = uuid.uuid4().hex[:8]
    store_base = str(DEFAULT_STORE / f"ml_{run}")
    try:
        manifest = train_commodity_models(spark, sf_dir, commodities=2, store_base=store_base)
        # scoring reuses the feature tables training just wrote (J8: the
        # same store round-trip, zero recomputation)
        ts, _ = build_training_set(spark, sf_dir, store_base, materialize=False)
        scores = score_batch(spark, ts, manifest)
        out = scores.select(
            "household_key",
            "commodity_desc",
            F.round(F.col("prediction") + 1e-9, 1).alias("prediction_bucket"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(store_base, ignore_errors=True)


QUERIES = {"train_score_propensity": q_train_score_propensity}
ORACLES: dict[str, str] = {}
