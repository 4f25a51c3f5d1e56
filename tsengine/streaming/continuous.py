"""Streaming continuous aggregates (SURVEY.md §2.9).

The reference has NO streaming (pull-based batch over a live store); the
engine's primary continuous-aggregate path is the idempotent incremental
batch runner (tsengine.checkpoint) per SURVEY.md §2.9.  This module adds the
Structured Streaming rendering for ingest-time rollups: file-source stream
over the transcripts directory -> watermarked tumbling-window aggregate ->
tier sink, runnable with Trigger.AvailableNow for deterministic tests.

Latency (lag) is NOT computable in a pure streaming aggregate (needs
per-conv ordering across microbatches), so the streaming tier carries the
count/role-distribution plane; the latency plane stays on the batch path —
the same split TimescaleDB-style systems make (counts streamed, complex
aggregates on refresh).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsengine.synth import TRANSCRIPT_COLS


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp, day string"
        )
        .option("pathGlobFilter", "*.parquet")
        .parquet(path)
    )


def streaming_tier(
    stream: DataFrame, width_sec: int = 60, watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window per-conv rollup: cnt + role counts.
    Late rows beyond the watermark are dropped (late-data policy)."""
    w = F.window(F.col("ts"), f"{width_sec} seconds")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), w.alias("win"), F.col("role"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "conv_id",
            F.col("win.start").alias("bucket"),
            "role",
            "cnt",
        )
    )


def run_available_now(
    spark: SparkSession, in_path: str, out_path: str, checkpoint: str,
    width_sec: int = 60,
) -> None:
    """Process everything currently in `in_path` exactly once and stop —
    the deterministic test/bootstrap mode.  Output mode append requires the
    watermark to close windows; AvailableNow drains and finalizes."""
    tier = streaming_tier(stream_transcripts(spark, in_path), width_sec)
    q = (
        tier.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
