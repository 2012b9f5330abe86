"""Streaming exact deduplication (training-data ingest guard).

The batch face of this operator is operators/dedup.exact_dedup (hash
groupBy). On a continuously-arriving corpus the same semantics run as
Structured Streaming state: a row whose content hash was already seen
within the watermark horizon is dropped before it ever reaches the
tokenizer — the cheapest place to kill recrawl duplicates in an
ingest pipeline. State is bounded by the watermark (Spark evicts hash
state older than the horizon), which is the correct contract for
Common-Crawl-style recrawls: duplicates arrive close together; a
re-appearance beyond the horizon is a fresh snapshot and SHOULD
re-enter (latest_snapshot recency dedup then picks the winner
downstream).

One function serves both faces so stream == batch is testable on
finite input (same pattern as streaming/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_exact(
    df: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first row per exact content hash.

    Streaming input: watermarked stateful dedup
    (dropDuplicatesWithinWatermark) — state size is O(distinct hashes
    within the horizon), not O(stream).
    Batch input: plain hash dropDuplicates (identical kept-hash set on
    finite input; which physical row survives a duplicate group is
    engine-chosen in both modes, so equivalence is on hash sets)."""
    hashed = df.withColumn(
        "content_hash", F.md5(F.coalesce(F.col(text_col), F.lit("")))
    )
    if hashed.isStreaming:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])
