"""Training-corpus sampling / packing operators.

domain_mixture     — temperature-flattened sampling weights per
                     (lang, source) group: the CCNet/The-Pile-style
                     rebalancing step that keeps a 100 TB crawl from
                     being 90% of one domain. Pure aggregation — one
                     shuffle on the group key, a broadcast total.
sequence_packing   — streaming concat-and-chunk packing (GPT-style
                     pretraining batches): docs in deterministic
                     doc_id order are concatenated and split into
                     fixed token budgets; each doc is assigned the
                     pack where it STARTS. Sharded two-pass prefix
                     sum (the operators/ids.py scheme) — no global
                     single-partition window, order fully
                     deterministic regardless of shard boundaries.

Both are exactly replayable in ANSI SQL (driver oracles).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F


def domain_mixture(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    *,
    temperature: float = 0.7,
) -> DataFrame:
    """Per-group doc counts and temperature-adjusted sampling weights:
    w_g ∝ p_g^T (T < 1 flattens the head, T = 1 is proportional).
    Returns one row per group: n_docs, share, weight, and the
    expected docs per 100k sampled — the numbers a mixture-sampling
    job consumes. Scale note: |groups| << |docs|, so after the count
    aggregation everything is broadcast-sized; the window over the
    singleton partition is a metadata-only step."""
    counts = df.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    w = W.partitionBy()
    p = F.col("n_docs") / F.sum("n_docs").over(w)
    pw = F.pow(p, F.lit(float(temperature)))
    return counts.select(
        *group_cols,
        "n_docs",
        F.round(p, 6).alias("share"),
        F.round(pw / F.sum(pw).over(w), 6).alias("weight"),
        F.round(pw / F.sum(pw).over(w) * 100_000, 2).alias("per_100k"),
    )


def sequence_packing(
    df: DataFrame,
    *,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every doc to a training pack: docs are concatenated in
    id order and chunked every `budget` tokens (whitespace count, the
    driver-oracle convention); a doc belongs to the pack where its
    first token lands. Output: (doc_id, n_tokens, pack_id, pack_pos).

    Sharded two-pass prefix sum (the assign_dense_ids scheme — this
    used to be ONE `W.partitionBy().orderBy(id)` window, i.e. a
    single task serializing the whole corpus):
      1. range-repartition by id + sort within shards;
      2. per-shard token totals (tiny collect) -> cumulative token
         offsets on the driver;
      3. per-shard local cumsum + offset -> global start offsets,
         identical to the single-window result REGARDLESS of where
         the range partitioner cuts the shards.
    pack_pos stays a window, but partitioned by pack_id — millions of
    budget-bounded groups, never a single-partition exchange
    (gated in tools/explain_audit.py)."""
    toks = F.size(F.filter(F.split(F.col(text_col), " "),
                           lambda x: x != ""))
    base = df.select(F.col(id_col), toks.cast("long").alias("n_tokens"))
    n_parts = (
        num_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    parted = (
        base.repartitionByRange(n_parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sums = {
        r._pid: int(r.s)
        for r in parted.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    budget_i = int(budget)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0  # tokens already consumed within this shard
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iat[0])
            n = pdf["n_tokens"].to_numpy()
            csum = n.cumsum()
            start = offsets[pid] + local + csum - n
            local += int(csum[-1])
            out = pdf.drop(columns=["_pid"]).copy()
            out["pack_id"] = (start // budget_i).astype("int64")
            yield out

    packed = parted.mapInPandas(
        assign, f"`{id_col}` long, n_tokens long, pack_id long"
    )
    wp = W.partitionBy("pack_id").orderBy(id_col)
    return packed.select(
        id_col, "n_tokens", "pack_id",
        F.row_number().over(wp).cast("long").alias("pack_pos"),
    )
