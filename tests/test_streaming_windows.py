"""Watermarked event-time windows: streaming result == batch result
on the same finite input (the availableNow trigger drains the file
source, the complete-mode snapshot lands the final state)."""

from __future__ import annotations

import os
import shutil

import pytest

from search_engine_spark.streaming.windows import (
    run_stream_to_batch,
    sliding_window_rates,
    windowed_event_counts,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))


def test_stream_equals_batch(spark, events, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("stream_win"))
    in_dir = os.path.join(tmp, "in")
    events.write.mode("overwrite").parquet(in_dir)

    out_dir = os.path.join(tmp, "out")
    run_stream_to_batch(
        spark, in_dir, EVENTS_SCHEMA,
        lambda s: windowed_event_counts(s, window="1 hour", watermark="2 hours"),
        os.path.join(tmp, "ckpt"), out_dir,
    )
    got = {
        (r.win_start, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r.win_start, r.event_type): (r.n, r.sum_value)
        for r in windowed_event_counts(events).collect()
    }
    assert got == want and len(got) > 0
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_plan_has_watermark(spark, events, tmp_path):
    in_dir = str(tmp_path / "in")
    events.limit(100).write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(in_dir)
    agg = windowed_event_counts(stream, watermark="2 hours")
    assert agg.isStreaming
    plan = agg._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan  # late-data bound is in the plan


def test_sliding_windows_overlap(spark, events):
    rates = sliding_window_rates(
        events, window="2 hours", slide="1 hour"
    ).collect()
    # every event lands in exactly 2 overlapping windows
    total = sum(r.n for r in rates)
    assert total == 2 * events.count()


def test_streaming_ingest_merges_to_batch_index(spark, tmp_path):
    """End-to-end: base batch index + streamed extra docs merged via
    merge_staged_epochs == batch index over the union corpus (segments
    byte-identical, queries identical)."""
    from pyspark.sql import functions as F

    from search_engine_spark.plans.build_index import build_index
    from search_engine_spark.plans.index_query import IndexReader
    from search_engine_spark.streaming.incremental import (
        merge_staged_epochs,
        start_incremental_ingest,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.filter(F.col("doc_id") < 350)
    extra = docs.filter(F.col("doc_id") >= 350).select("doc_id", "text")

    d_inc = str(tmp_path / "idx_inc")
    d_full = str(tmp_path / "idx_full")
    kw = dict(n_buckets=8, segment_size=64, stem=True,
              salt_threshold=50, max_salts=4)
    build_index(spark, base, d_inc, **kw)
    build_index(spark, docs, d_full, **kw)

    in_dir = str(tmp_path / "stream_in")
    extra.write.parquet(in_dir)
    staging = str(tmp_path / "staging")
    q = start_incremental_ingest(spark, in_dir, staging, n_buckets=8, stem=True)
    q.awaitTermination()
    out = merge_staged_epochs(spark, staging, d_inc,
                              segment_size=64, max_salts=4)
    assert out["epochs_merged"] >= 1

    seg_cols = ["bucket", "term", "salt", "seg", "n", "doc_ids", "tfs",
                "doclens", "max_tfnorm"]
    def segs(d):
        return sorted(
            tuple(row[c] for c in seg_cols)
            for row in spark.read.parquet(f"{d}/postings").select(*seg_cols).collect()
        )
    assert segs(d_inc) == segs(d_full)
    ri, rf = IndexReader(spark, d_inc), IndexReader(spark, d_full)
    for qq in ("spark join", "data"):
        assert [(r.doc_id, round(r.score, 9)) for r in ri.search(qq, k=10).collect()] == \
               [(r.doc_id, round(r.score, 9)) for r in rf.search(qq, k=10).collect()]


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """stream == batch for the ingest-side exact dedup: the kept
    content-hash set (and row count) agree on finite input."""
    import pandas as pd

    from search_engine_spark.streaming.dedup import dedup_exact

    rows = []
    base = pd.Timestamp("2026-01-01 00:00:00")
    for i in range(40):
        rows.append((i, f"doc body {i % 25}", base + pd.Timedelta(seconds=i)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    inp = tmp_path / "in"
    inp.mkdir()
    # Spark's streaming parquet reader wants microsecond timestamps
    pdf.iloc[:20].to_parquet(inp / "a.parquet", coerce_timestamps="us")
    pdf.iloc[20:].to_parquet(inp / "b.parquet", coerce_timestamps="us")

    batch = dedup_exact(
        spark.createDataFrame(pdf), text_col="text", ts_col="ts"
    )
    want = {r.content_hash for r in batch.collect()}
    assert len(want) == 25

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .format("parquet").load(str(inp))
    )
    out = str(tmp_path / "out")
    q = (
        dedup_exact(stream, text_col="text", ts_col="ts")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_rows = spark.read.parquet(out).collect()
    got = {r.content_hash for r in got_rows}
    assert got == want
    assert len(got_rows) == 25  # each hash kept exactly once
