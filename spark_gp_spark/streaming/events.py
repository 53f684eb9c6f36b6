"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY §2.8); these operators extend
the engine with the standard stream shapes a training-data pipeline needs:
watermarked tumbling-window aggregation and gap-session windows.  For tests
and the correctness oracle, the same parquet data is driven through a real
``readStream`` → ``writeStream(memory)`` query with ``processAllAvailable``,
so the streaming plan (watermark, stateful agg) is genuinely exercised while
the result stays comparable to a batch SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA_NANOS = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet.

    Two quirks of the test corpus handled here, both invisible to callers:
    the source path is a single file (file-stream sources need a directory +
    glob), and timestamps are TIMESTAMP(NANOS) which Spark only reads as raw
    longs (``nanosAsLong``) — truncated to microseconds exactly like DuckDB
    does on read.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA_NANOS)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_event_aggregation(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event type (works on batch or stream)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_streaming_window_counts(
    spark: SparkSession, sf_dir: str, window: str = "1 hour", query_name: str = "gp_stream_counts"
) -> DataFrame:
    """Drive the events parquet through a real streaming query; returns the
    complete-mode result as a batch DataFrame."""
    stream = read_event_stream(spark, sf_dir)
    agg = windowed_event_aggregation(stream, window)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def streaming_sessionization(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    query_name: str = "gp_stream_sessions",
) -> DataFrame:
    """Session windows (gap-based) on the event stream via
    ``session_window`` — Spark's native stateful session operator."""
    stream = read_event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
