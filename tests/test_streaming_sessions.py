"""Stateful streaming sessionization (applyInPandasWithState):
closed sessions from the stream must equal the batch window-function
sessionization, with only the open per-user tails outstanding."""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import Window as W, functions as F

from search_engine_spark.streaming.sessions import streaming_sessionize

SCHEMA = "user_id long, ts timestamp"


def _run_stream(spark, in_dir, out_root, gap_minutes, watermark):
    stream = (
        spark.readStream.schema(SCHEMA).format("parquet")
        .option("maxFilesPerTrigger", 1).load(in_dir)
    )
    sess = streaming_sessionize(stream, gap_minutes=gap_minutes, watermark=watermark)
    q = (
        sess.writeStream.format("parquet")
        .option("path", os.path.join(out_root, "out"))
        .option("checkpointLocation", os.path.join(out_root, "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(out_root, "out"))


def test_session_merges_across_batches(spark, tmp_path):
    """A session split across micro-batches merges; a later burst
    stays open in state."""
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    b1 = pd.DataFrame({"user_id": [1, 1], "ts": [t0, t0 + pd.Timedelta("10min")]})
    b2 = pd.DataFrame({
        "user_id": [1, 1, 1],
        "ts": [t0 + pd.Timedelta("20min"), t0 + pd.Timedelta("5h"),
               t0 + pd.Timedelta("5h10min")],
    })
    in_dir = str(tmp_path / "in"); os.makedirs(in_dir)
    for i, b in enumerate((b1, b2)):
        tmp = str(tmp_path / f"tmp{i}")
        spark.createDataFrame(b).coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = os.path.join(in_dir, f"{i:02d}.parquet")
        shutil.copy(glob.glob(tmp + "/*.parquet")[0], dst)
        os.utime(dst, (1_000_000_000 + i * 10,) * 2)

    got = _run_stream(spark, in_dir, str(tmp_path), 120, "10 minutes").collect()
    assert len(got) == 1
    r = got[0]
    assert (r.user_id, r.n_events) == (1, 3)
    assert r.session_start == t0 and r.session_end == t0 + pd.Timedelta("20min")


def test_stream_sessions_equal_batch(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts"
    )
    parts_dir = str(tmp_path / "parts")
    (
        ev.orderBy("ts")
        .withColumn("bucket", F.ntile(4).over(W.orderBy("ts")))
        .write.partitionBy("bucket").mode("overwrite").parquet(parts_dir)
    )
    in_dir = str(tmp_path / "in"); os.makedirs(in_dir)
    n = 0
    for b in range(1, 5):
        for f in sorted(glob.glob(f"{parts_dir}/bucket={b}/*.parquet")):
            dst = os.path.join(in_dir, f"{b:02d}_{n}.parquet")
            shutil.copy(f, dst)
            # FileStreamSource orders batches by mtime — pin it so the
            # stream arrives in event-time order like a real ingest
            os.utime(dst, (1_000_000_000 + n * 10,) * 2)
            n += 1

    got = _run_stream(spark, in_dir, str(tmp_path), 120, "1 hour")

    w = W.partitionBy("user_id").orderBy("ts")
    truth = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            (
                F.col("prev").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 7200)
            ).cast("int"),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    keys = ["user_id", "session_start", "session_end", "n_events"]
    n_users = ev.select("user_id").distinct().count()
    assert got.join(truth, keys, "left_anti").count() == 0  # no phantom sessions
    missing = truth.join(got, keys, "left_anti")
    assert missing.count() <= n_users  # only open tails outstanding
    assert got.count() + missing.count() == truth.count()
