"""Custom stateful streaming: ``applyInPandasWithState`` per-key state.

The reference has no stateful streaming at all (SURVEY.md §2.8 — its
"streaming" is chunked HTTP transfer); this is the engine's extension path for
operators whose state Spark's built-in windowed/session aggregates cannot
express. The demonstrator keeps per-user running stats (event count, value
total, last-seen timestamp) in explicit group state and emits an updated row
per user per micro-batch.

Design notes for 100 TB streams:
- state is keyed by ``user_id`` → partitioned across executors by the
  stateful-operator shuffle; each key's state is O(1) floats, so state-store
  size grows with distinct users only, not with events;
- the update function is Arrow-batched per key-group (pandas), not per row;
- the SAME result is computable in batch as one groupBy — asserted in tests
  (``user_stats_batch`` ≡ final streaming state), which is also the recovery
  path for state bootstrapping.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import EVENTS_SCHEMA, _normalize_ts

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def make_update_user_stats():
    """Build the per-group state-update function.

    Returned from a factory (→ cloudpickle serializes it BY VALUE) rather than
    defined at module top level (→ serialized by reference, which breaks on
    executors whose Python workers can't import this package — e.g. a driver
    that added the repo to ``sys.path`` manually)."""

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            n, total, last = state.get
        else:
            n, total, last = 0, 0.0, None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_last = pdf["ts"].max()
            if last is None or batch_last > last:
                last = batch_last
        state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last],
            }
        )

    return update


def user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch equivalent of the streaming state: one groupBy."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


def user_stats_streaming(
    spark: SparkSession,
    source_dir: str,
    query_name: str = "user_stats_stream",
) -> DataFrame:
    """Run the stateful operator as a real streaming query over a parquet file
    stream; returns the latest emitted row per user from the in-memory sink."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _normalize_ts(spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir))
    updated = stream.groupBy("user_id").applyInPandasWithState(
        make_update_user_stats(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the memory sink accumulates one row per user per micro-batch; the latest
    # (max n_events) row per user is the final state
    sink = spark.sql(f"SELECT * FROM {query_name}")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
