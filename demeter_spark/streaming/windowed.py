"""Watermarked windowed aggregation over the events stream.

The reference is batch-only (SURVEY.md §2.10); this provides the Structured
Streaming counterpart the task mandates for stream payloads: event-time
tumbling windows with a watermark bounding late data, runnable incrementally
with Trigger.AvailableNow (same checkpoint-resume semantics as
streaming/incremental.py). Output is append-mode: a window emits once its
watermark passes, giving exactly-once, late-data-tolerant aggregates.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Tumbling-window counts per event_type with a late-data watermark."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
