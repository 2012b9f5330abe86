"""Incremental ingest via Structured Streaming foreachBatch.

The reference is a batch indexer with no streaming semantics
(SURVEY.md section 2.10) — its incremental story is checkpoint-
resumable batch. This module is the natural Spark extension for
continuously-arriving pages: a file-source stream feeds each
micro-batch through the SAME stage-A tokenize pipeline into a
bucket-partitioned postings_flat delta directory; stage B (segment +
compress) then runs as the normal resumable batch over the new
buckets. Exactly-once comes from foreachBatch epoch ids + idempotent
per-epoch output paths.

Kept deliberately thin: all real logic is the batch pipeline; this is
plumbing that demonstrates the streaming-ingest shape without
inventing semantics the reference lacks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from search_engine_spark.operators.aggregates import postings_from_text
from search_engine_spark.plans.build_index import _bucket_expr


def start_incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    staging_dir: str,
    *,
    schema: str = "doc_id long, text string",
    n_buckets: int = 64,
    stem: bool = True,
    checkpoint_dir: str | None = None,
):
    """readStream over a parquet directory -> per-epoch postings_flat
    deltas under staging_dir/epoch=<n>/ (idempotent on replay)."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        out = os.path.join(staging_dir, f"epoch={epoch_id}")
        flat = postings_from_text(batch_df, stem=stem).withColumn(
            "bucket", _bucket_expr(F.col("term"), n_buckets)
        )
        # overwrite => re-delivered epochs converge (exactly-once sink)
        flat.write.mode("overwrite").partitionBy("bucket").parquet(out)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation",
                checkpoint_dir or os.path.join(staging_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
