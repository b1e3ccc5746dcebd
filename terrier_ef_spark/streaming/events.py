"""Streaming windowed aggregation with watermark-based late-data
handling over the events table shape (ts, event_type, value).

Demonstrates the Structured Streaming side of the engine (task brief:
'watermarks + windowed aggs for late data'): a file-source stream of
event parquet is aggregated into 5-minute tumbling windows; rows later
than the watermark relative to the max seen event time are dropped by
the engine; in append output mode a window is emitted exactly once,
when the watermark passes its end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "ts timestamp, event_type string, value double"


def windowed_event_counts(
    stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """The streaming aggregation plan: tumbling-window counts + sums per
    event_type with a `watermark` lateness bound. Works on any streaming
    DataFrame with the events schema."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_events_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    *,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Consume all event parquet currently in input_dir
    (Trigger.AvailableNow) into an append-mode windowed-count parquet
    sink; returns the sink as a DataFrame. Re-running after new files
    land appends newly-finalized windows (checkpointed source +
    watermark state). Windows still open when the stream drains (i.e.
    not yet passed by the watermark) remain in state and are emitted on
    a later run — append mode emits each window exactly once."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    agg = windowed_event_counts(stream, window, watermark)
    query = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "windows"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(os.path.join(out_dir, "windows"))
