"""Per-partition lineage manifest + checkpoint/resume (SURVEY.md S4/S6/J5).

The manifest is an append-only table of per-bucket build records:

    manifest(run_id string, bucket int, status string, n_terms long,
             n_postings long, n_segments long, bytes long, wall_s double,
             finished_at timestamp)

Resume = read manifest, LEFT ANTI JOIN pending buckets against
status='done' (SURVEY.md J5). Bucket writes are idempotent (dynamic
partition overwrite), so a re-run after any crash converges to the
same index. New requirement vs the single-node reference, which has no
resume story [B:6, B:14].
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = (
    "run_id string, bucket int, status string, n_terms long, n_postings long,"
    " n_segments long, bytes long, wall_s double, finished_at timestamp"
)


class Manifest:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.path = os.path.join(index_dir, "manifest")

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)

    def append(self, rows: list[tuple]) -> None:
        df = self.spark.createDataFrame(rows, MANIFEST_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def pending(self, all_buckets: DataFrame) -> DataFrame:
        """all_buckets(bucket int) minus completed — left anti join.

        Latest-wins per bucket: an `invalidated` row appended after a
        `done` row (extend_index touching the bucket) puts the bucket
        back in the pending set."""
        from pyspark.sql import Window as W

        m = self.read()
        if m is None:
            return all_buckets
        w = W.partitionBy("bucket").orderBy(F.desc("finished_at"))
        latest = (
            m.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
        done = latest.filter(F.col("status") == "done").select("bucket")
        return all_buckets.join(done, "bucket", "left_anti")

    def invalidate(self, buckets: list[int], run_id: str) -> None:
        """Mark buckets stale (their segments must be rebuilt)."""
        if not buckets:
            return
        import datetime as dt

        now = dt.datetime.now(dt.timezone.utc)
        self.append(
            [
                (run_id, int(b), "invalidated", 0, 0, 0, 0, 0.0, now)
                for b in buckets
            ]
        )
