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
                     pack where it STARTS. One window cumsum —
                     no Python, order fully deterministic.

Both are exactly replayable in ANSI SQL (driver oracles).
"""

from __future__ import annotations

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
) -> DataFrame:
    """Assign every doc to a training pack: docs are concatenated in
    id order and chunked every `budget` tokens (whitespace count, the
    driver-oracle convention); a doc belongs to the pack where its
    first token lands. Output: (doc_id, n_tokens, pack_id, pack_pos).

    Scale note: the global cumsum is ONE window over an id-ordered
    sort — at 10^12 docs you run it per shard (id ranges are dense per
    shard) and offset pack_ids by the per-shard totals, which is the
    same two-pass prefix-sum trick assign_dense_ids uses."""
    toks = F.size(F.filter(F.split(F.col(text_col), " "),
                           lambda x: x != ""))
    w = W.partitionBy().orderBy(id_col)
    base = df.select(
        F.col(id_col), toks.cast("long").alias("n_tokens")
    ).withColumn(
        "_start", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn(
        "pack_id", F.floor(F.col("_start") / F.lit(int(budget))).cast("long")
    )
    wp = W.partitionBy("pack_id").orderBy(id_col)
    return base.select(
        id_col, "n_tokens", "pack_id",
        F.row_number().over(wp).cast("long").alias("pack_pos"),
    )
