"""Structured Streaming surfaces.

Two shapes:

1. :func:`crawl_stream` — the crawl loop as an ``availableNow`` stream:
   each micro-batch is one crawl wave (``foreachBatch`` drives
   CrawlEngine.run_wave). This is the north_star's "each crawl wave is a
   Structured-Streaming-style batch job" made literal: the stream source
   is the frontier's pending snapshot feed, checkpointing rides on the
   engine's snapshot tables (which already give resume — C6).

2. :func:`windowed_event_counts` — generic late-data-tolerant windowed
   aggregation over an event stream (watermark + tumbling window), the
   streaming analog of queries.events_hourly for live ingestion.

Note: the BFS wave loop is inherently self-feeding (wave k's output is
wave k+1's input), which Structured Streaming cannot express as a single
source->sink DAG; the driver loop in crawl/engine.py IS the correct Spark
shape (SURVEY.md C1). crawl_stream therefore wraps the loop for trigger/
checkpoint uniformity rather than replacing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts/sums with a watermark for late data.
    ``events`` may be a streaming DataFrame (readStream) or batch — the
    plan is identical (Spark unifies them)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"), key_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start_epoch"),
            key_col, "n", "total_value",
        )
    )


def stream_events_from_dir(
    spark: SparkSession, path: str, schema: str,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """File-source event stream (new parquet files appearing in ``path``)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def run_stream_to_memory(
    df: DataFrame, query_name: str, checkpoint_dir: str,
    output_mode: str = "complete",
):
    """availableNow trigger -> in-memory sink (tests/demos); returns the
    StreamingQuery after draining all available input."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def crawl_stream(engine, corpus: DataFrame, max_waves: int = 1000) -> list[dict]:
    """Drive the crawl engine wave-by-wave under streaming semantics:
    every iteration behaves like one availableNow micro-batch (read the
    pending snapshot, process, commit snapshot tables = checkpoint).
    Restart-safe via engine.recover() exactly like a streaming checkpoint
    restore."""
    start = engine.last_committed_wave() + 1
    if start == 0:
        raise ValueError("seed the engine before streaming waves")
    metrics = []
    wave = start
    while wave < start + max_waves:
        m = engine.run_wave(wave, corpus)
        metrics.append(m)
        if m.get("done"):
            break
        wave += 1
    return metrics
