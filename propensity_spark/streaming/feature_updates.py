"""Streaming feature maintenance: incremental MERGE of event-derived
features into the feature store via foreachBatch — the continuous
version of the reference's daily batch job (its 'streaming story' is a
daily re-run, RUNME.py:184-235; this is what replaces it when events
arrive as a stream).

Each micro-batch computes per-user aggregates for the users PRESENT in
the batch only, reads their current feature rows, merges, and MERGE-
upserts — so per-batch work scales with batch size, not table size.
foreachBatch gives effectively-once semantics against the idempotent
MERGE (same PK rewrite)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from propensity_spark.feature_store import FeatureTable
from propensity_spark.io import SCHEMAS


def _raw_event_schema() -> T.StructType:
    return T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.LongType())
            for f in SCHEMAS["events"].fields
        ]
    )


def stream_user_features(
    spark: SparkSession, sf_dir: str, store_base: str, day
) -> FeatureTable:
    """Run the events stream to completion (synchronously, for tests /
    backfills; in production the query simply stays up), maintaining a
    (user_id, day)-keyed feature table of event counts and value sums.

    A checkpoint under `store_base` makes restarts exactly-once: a
    re-run resumes from the last committed file offset instead of
    reprocessing (and double-counting) the whole source."""
    table = FeatureTable(spark, "user_stream_features", ["user_id", "day"], store_base)
    stamp = F.lit(day).cast("date")

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        incoming = (
            batch_df.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .withColumn("day", stamp)
        )
        if not table.exists():
            table.create(incoming)
            return
        current = table.read(day).join(
            F.broadcast(incoming.select("user_id")), "user_id", "left_semi"
        )
        merged = (
            incoming.unionByName(current)
            .groupBy("user_id", "day")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
        table.merge(merged)

    stream = (
        spark.readStream.schema(_raw_event_schema())
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    q = (
        stream.writeStream.option("checkpointLocation", f"{store_base}/_checkpoint")
        .foreachBatch(merge_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return table
