"""Dense doc_id minting — distributed, deterministic, no driver loop.

The reference assigns dense local integer docIDs as it reads the corpus
sequentially [PK — SURVEY.md 1.2]. At 10^12 docs a global
``row_number() OVER (ORDER BY url)`` would funnel everything through a
single partition, so we use the standard two-pass scheme:

1. range-repartition by the order column and sort within partitions
   (Spark's range partitioner samples boundaries -> balanced parts);
2. count rows per partition (small job), compute cumulative offsets on
   the driver (one tiny array), broadcast;
3. per-partition local index + offset -> globally dense, deterministic
   ids equivalent to the single-node sequential assignment.

The order column must be unique (url after dedup) for determinism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def assign_dense_ids(
    df: DataFrame,
    order_col: str = "url",
    *,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n_parts, F.col(order_col)).sortWithinPartitions(
        order_col
    )
    parted = parted.withColumn("_pid", F.spark_partition_id())
    # Job 1: per-partition counts (tiny result). Cache so the ids pass
    # sees the identical partitioning.
    parted = parted.persist()
    counts = {
        r._pid: r.n
        for r in parted.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in parted.schema.fields
        if f.name != "_pid"
    ) + f", {id_col} long"

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iat[0])
            base = offsets[pid] + local
            pdf = pdf.drop(columns=["_pid"])
            pdf[id_col] = pd.RangeIndex(base, base + len(pdf)).astype("int64")
            local += len(pdf)
            yield pdf

    result = parted.mapInPandas(add_ids, out_schema)
    return result
