"""Structured Streaming operators over the events stream.

The streaming twins of the batch relational aggregations: watermarked
windowed aggregation and session windows. Designed for
``readStream`` file/Kafka sources; tested with the parquet file source
and ``trigger(availableNow=True)`` so the stream drains deterministically
and can be compared row-for-row with its batch equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events directory (parquet)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def hourly_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the
    watermark is dropped; state is bounded — mandatory for an unbounded
    stream at production scale)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.round(F.col("value") * 100)).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:00:00").alias("hour_bucket"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            "sum_value_cents",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based), watermarked."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("sess.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once dedup: drop replayed events by event_id
    within the watermark horizon (``dropDuplicatesWithinWatermark`` —
    state for an id is releasable once the watermark passes it, so
    state stays bounded on an unbounded stream; a plain
    ``dropDuplicates`` would grow state forever). The streaming twin of
    ``dedup_exact``: an at-least-once upstream (Kafka replays, file
    redelivery) becomes exactly-once content downstream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_to_memory(
    streamed: DataFrame, query_name: str, timeout_sec: int = 420
) -> None:
    """Drain an availableNow stream into an in-memory table (tests /
    smoke); production sinks are Iceberg/parquet ``writeStream`` with
    checkpointLocation."""
    q = (
        streamed.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def batch_hourly_agg(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`hourly_agg` (same expressions, no watermark)
    — the comparison oracle for the streaming test."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.round(F.col("value") * 100)).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:00:00").alias("hour_bucket"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            "sum_value_cents",
        )
    )
