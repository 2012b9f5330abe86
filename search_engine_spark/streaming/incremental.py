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


def merge_staged_epochs(spark: SparkSession, staging_dir: str,
                        index_dir: str, **stage_b_kwargs) -> dict:
    """Fold the staged per-epoch postings_flat deltas into an existing
    index: append the delta rows to the flat table's bucket partitions,
    recompute the derived tables, invalidate + rebuild the affected
    buckets (all of them when avgdl moves — BM25 normalization is
    collection-wide). Together with start_incremental_ingest this makes
    streaming ingest converge to exactly the index a batch build over
    the union corpus produces (tested)."""
    import glob
    import uuid as _uuid

    from pyspark.sql import functions as F

    from search_engine_spark.plans.build_index import (
        IndexPaths,
        Manifest,
        _read_meta,
        _stage_a_stats,
        _stage_b,
    )

    epochs = sorted(glob.glob(os.path.join(staging_dir, "epoch=*")))
    if not epochs:
        return {"epochs_merged": 0, "buckets_rebuilt": 0}
    paths = IndexPaths(index_dir)
    meta = _read_meta(spark, paths)
    n_buckets = int(meta["n_buckets"])
    salt_threshold = int(meta.get("salt_threshold", 1_000_000))
    run_id = _uuid.uuid4().hex[:12]

    delta = spark.read.parquet(*epochs)
    # append in the SAME layout the index's flat table uses (mixing
    # hive bucket=* dirs with plain sorted files in one directory
    # breaks partition discovery): new-layout flat gets sorted plain
    # files (row-group pruning), pre-upgrade flat keeps hive dirs
    old_layout = any(
        p.startswith("bucket=") for p in os.listdir(paths.flat)
    )
    if old_layout:  # pragma: no cover - upgrade path for old indexes
        (
            delta.repartition(n_buckets, "bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(paths.flat)
        )
    else:
        (
            delta.select(*spark.read.parquet(paths.flat).columns)
            .sortWithinPartitions("bucket", "term", "doc_id")
            .write.mode("append")
            .parquet(paths.flat)
        )
    _stage_a_stats(spark, paths, n_buckets=n_buckets,
                   salt_threshold=salt_threshold)
    touched = list(range(n_buckets))  # avgdl moved -> all buckets
    manifest = Manifest(spark, index_dir)
    if manifest.exists():
        manifest.invalidate(touched, run_id)
    _stage_b(
        spark, paths, touched,
        segment_size=stage_b_kwargs.get("segment_size", 4096),
        salt_threshold=salt_threshold,
        max_salts=stage_b_kwargs.get("max_salts", 32),
        run_id=run_id,
    )
    for e in epochs:  # consumed: a replayed epoch would double-count
        import shutil

        shutil.rmtree(e, ignore_errors=True)
    return {"epochs_merged": len(epochs), "buckets_rebuilt": len(touched)}
