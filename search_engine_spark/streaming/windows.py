"""Event-time windowed aggregations with watermarks (Structured
Streaming breadth beyond the reference's batch-only model).

The reference engine has no streaming semantics (SURVEY.md section
2.10); these operators exist for the continuously-arriving side of a
web-scale ingest pipeline: crawl/event telemetry rolls up into
event-time windows while the index build itself stays checkpoint-
resumable batch (streaming/incremental.py).

Design notes for cluster scale:
- the aggregation state is partitioned by (window, key) — Spark's
  stateful HashAggregate shards it across executors; the watermark
  bounds state size (windows older than watermark are finalized and
  evicted), so state is O(active windows x keys), not O(stream).
- `withWatermark` must reference the SAME column used in `window()`
  or late rows are never dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts + value sums per key.

    Works on both a streaming DataFrame (late rows beyond `watermark`
    dropped, finalized windows evicted from state) and a batch
    DataFrame (identical grouping, watermark is a no-op) — the batch
    path is what the DuckDB oracle checks.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sliding_window_rates(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window event rates (overlapping windows)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("win_end"),
            "n",
        )
    )


def run_stream_to_batch(
    spark,
    input_dir: str,
    schema: str,
    transform,
    checkpoint_dir: str,
    out_dir: str,
) -> None:
    """Drive a finite file-source stream through `transform` with the
    availableNow trigger, landing finalized results as parquet via
    foreachBatch (complete-mode snapshot per epoch; the last epoch wins
    by overwrite — exactly-once on replay)."""
    stream = spark.readStream.schema(schema).format("parquet").load(input_dir)
    agg = transform(stream)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
