"""Custom stateful streaming operator via `applyInPandasWithState`
(extension scope, SURVEY.md §2.10/§7 — the reference is batch-only).

This is the arbitrary-state surface Structured Streaming offers beyond
declarative window aggs: per-key mutable state carried across
micro-batches, Arrow-batched through pandas. The operator here keeps a
per-user running (event_count, value_sum) and emits the updated totals
every micro-batch the key appears in; the *final* emission per key
therefore equals the global batch aggregate, which is exactly what the
oracle checks — batch/stream parity for a hand-written stateful op.

Scale notes:
- State is partitioned by the grouping key and lives in the state
  store; per-key state here is two scalars, so state size is O(distinct
  users), independent of event volume.
- Arrow batches flow through pandas per group-per-batch; the Python
  work is O(batch rows) with no per-row Python function calls
  (`len(pdf)` / `pdf.sum()` are vectorized).
- In production the emitted updates feed an idempotent sink (see
  feature_updates.py for the epoch-deduped MERGE pattern); the memory
  sink + max-reduction here is the test harness equivalent.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F




def running_totals(key, pdfs, state):
    """Per-user running (n_events, sum_value); state = two scalars."""
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
    )


def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming run of the stateful operator: readStream
    over the events parquet, groupBy(user_id).applyInPandasWithState,
    update-mode memory sink drained synchronously. Because the running
    totals are cumulative, the emission with the highest n_events per
    user is the final state — selected with a max_by reduction, rounded
    like every money aggregate, and compared to the plain batch
    GROUP BY oracle."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    name = f"stateful_out_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # File-embedded schema: ts arrives as long (nanos) or timestamp
    # (micros) depending on the fixture generator; this operator never
    # touches ts, so no normalization is needed.
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")  # source dirs hold all tables
        .parquet(sf_dir)
    )
    updates = stream.groupBy("user_id").applyInPandasWithState(
        running_totals,
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table(name).collect()
    finally:
        q.stop()
    emitted = spark.createDataFrame(rows, updates.schema)
    return (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("__final_sum"),
        )
        .select(
            "user_id",
            "n_events",
            F.round(F.col("__final_sum") + 1e-6, 2).alias("sum_value"),
        )
    )


ORACLES = {
    "stream_stateful": """
        SELECT user_id,
               count(*) AS n_events,
               round(1e-6 + sum(value), 2) AS sum_value
        FROM events
        GROUP BY user_id
    """,
}

QUERIES = {
    "stream_stateful": q_stream_stateful,
}
