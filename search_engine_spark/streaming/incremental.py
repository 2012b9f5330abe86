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
                        index_dir: str, generations: bool | None = None,
                        **stage_b_kwargs) -> dict:
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
    # whole-index generation transaction (plans/publish): the fold is
    # a multi-table mutation — on a generation-managed index run it
    # against a clone and commit with one atomic symlink swap. The
    # staged epochs are consumed only after a successful commit, so a
    # crashed generationed fold replays cleanly.
    from search_engine_spark.plans.publish import (
        begin_generation,
        is_generationed,
    )

    if generations is None:
        generations = is_generationed(index_dir)
    if generations:
        txn = begin_generation(index_dir)
        try:
            out = merge_staged_epochs(spark, staging_dir, txn.work,
                                      generations=False,
                                      **stage_b_kwargs)
        except BaseException:
            txn.abort()
            raise
        txn.commit()
        return out
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


def start_shard_ingest(
    spark: SparkSession,
    input_dir: str,
    shards_dir: str,
    *,
    schema: str = "doc_id long, text string",
    n_buckets: int = 64,
    stem: bool = True,
    segment_size: int = 4096,
    salt_threshold: int = 1_000_000,
    max_salts: int = 32,
    pages: bool = False,
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
):
    """LSM-cadence streaming ingest: each micro-batch becomes a FULL
    small index (both stages) under shards_dir/epoch=<n>/, built with
    the target's physical invariants (n_buckets, analyzer) so
    ``fold_shards`` can segment-append it via plans/merge.merge_into —
    fold cost O(epoch), never a rebuild of the serving index. This is
    the streaming twin of the shard-build + tiered-merge story the
    batch path serves at 10^12 docs (N workers build shard indexes,
    merges fold the tier), upgraded from merge_staged_epochs' flat
    deltas (whose fold re-runs stage B over every bucket because avgdl
    moves — correct, but O(total) per fold).

    pages=True: micro-batches are pages-shaped (url, warc_ts, html,
    text, lang) — each epoch dedups to the latest snapshot per url,
    assigns shard-local dense ids, builds from html, and writes the
    shard urlmap (so the folded index keeps doc_id→url resolution;
    merge_into offsets the ids). Exactly-once: the epoch output is
    rebuilt from scratch on replay (same epoch id → same directory),
    so re-delivery converges."""
    import shutil as _shutil

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string,"
            " lang string" if pages else schema
        ).format("parquet")
    )
    if max_files_per_trigger is not None:
        stream = stream.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    stream = stream.load(input_dir)

    from search_engine_spark.plans.build_index import build_index

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        out = os.path.join(shards_dir, f"epoch={epoch_id}")
        if os.path.isdir(out):  # replayed epoch: rebuild, converges
            _shutil.rmtree(out)
        src, html_col = batch_df, None
        if pages:
            from search_engine_spark.operators.dedup import (
                latest_snapshot,
            )
            from search_engine_spark.operators.ids import (
                assign_dense_ids,
            )

            src = assign_dense_ids(
                latest_snapshot(batch_df, "url", "warc_ts"), "url"
            )
            html_col = "html"
        build_index(
            spark, src, out, n_buckets=n_buckets, stem=stem,
            segment_size=segment_size, salt_threshold=salt_threshold,
            max_salts=max_salts, html_col=html_col,
        )
        if pages:
            (
                src.select("doc_id", "url", "warc_ts")
                .sort("doc_id")
                .write.mode("overwrite")
                .parquet(os.path.join(out, "urlmap"))
            )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation",
                checkpoint_dir or os.path.join(shards_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def fold_shards(spark: SparkSession, shards_dir: str,
                index_dir: str) -> dict:
    """Fold pending epoch shards into the serving index, in epoch
    order, via merge_into — O(incoming) per shard. Idempotent: a
    ledger (<index>/ingested_epochs.json, written atomically) records
    folded epoch names, so replaying a fold (crash between merge and
    ledger write aside — see below) skips consumed shards; the first
    shard bootstraps a missing index by file copy (no Spark compute).
    Shard directories are NOT deleted (the ledger is the source of
    truth; keep or reap them on your own retention schedule).

    Crash window: merge_into is not atomic (its own docstring) — a
    crash between a completed merge and the ledger write would
    re-merge that shard on replay. The ledger is therefore written
    BEFORE each merge with status 'folding' and committed to 'done'
    after, so a replay detects the torn state and refuses with the
    recovery instruction (re-run stage B from the flat, which is
    append-first and remains the source of truth) instead of silently
    double-ingesting."""
    import glob
    import json as _json
    import shutil as _shutil

    from search_engine_spark.plans.merge import merge_into

    ledger_path = os.path.join(index_dir, "ingested_epochs.json")
    ledger: dict[str, str] = {}
    if os.path.exists(ledger_path):
        with open(ledger_path) as f:
            ledger = _json.load(f)
    torn = [e for e, st in ledger.items() if st != "done"]
    if torn:
        raise RuntimeError(
            f"ledger records interrupted folds {torn} — the index may "
            "hold a partial merge; rebuild stage B from the flat table "
            "(plans/merge.merge_into docstring) before folding more"
        )

    def _write_ledger() -> None:
        tmp = ledger_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(ledger, f)
        os.replace(tmp, ledger_path)

    epochs = sorted(
        glob.glob(os.path.join(shards_dir, "epoch=*")),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )
    folded, stale_suggest = [], False
    for epoch in epochs:
        name = os.path.basename(epoch)
        if name in ledger:
            continue
        if not os.path.isdir(os.path.join(epoch, "postings")):
            continue  # in-flight epoch: the stream hasn't finished it
        if not os.path.isdir(index_dir):
            _shutil.copytree(epoch, index_dir)
            ledger[name] = "done"
            _write_ledger()
        else:
            # preflight BEFORE marking 'folding': an incompatible
            # shard (n_buckets/analyzer mismatch) must raise cleanly,
            # not poison the ledger into the torn state — the index
            # hasn't been touched yet
            from search_engine_spark.plans.merge import _check_compat

            _check_compat(spark, index_dir, epoch)
            ledger[name] = "folding"
            _write_ledger()
            res = merge_into(spark, index_dir, epoch)
            stale_suggest = stale_suggest or res["suggest_stale"]
            ledger[name] = "done"
            _write_ledger()
        folded.append(name)
    return {
        "epochs_folded": len(folded),
        "epochs": folded,
        "suggest_stale": stale_suggest,
    }
