"""Tiered index merge: combine BUILT indexes without re-tokenizing.

The parallel-ingest story at 10^12 docs: N workers each build a small
index over their shard (tokenize + SPIMI once), then merges fold the
tier into one serving index — the Lucene/LSM merge policy applied to
this engine's layout. Because the flat postings table IS the
tokenization output, a merge is:

  1. validate physical invariants match (n_buckets — the term→bucket
     hash — and the analyzer's stem flag);
  2. offset the second index's dense doc_id space past the first's
     allocated maximum (urlmap-aware: empty docs hold allocated ids
     that postings_flat never sees);
  3. union the flats (bucket-led re-sort so row-group pruning holds)
     — a column-level copy, NO text pipeline, NO Python;
  4. recompute collection stats (df/avgdl move) and rebuild segments
     — exactly the extend/compact convergence rule;
  5. union urlmaps/docstores when both sides carry them.

The result is value-identical to a fresh build over the concatenated
corpus (property-tested in tests/test_merge.py). Indexes with live
tombstones must be compacted first — merging masked postings would
silently resurrect deleted docs in the target.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from search_engine_spark.plans.build_index import (
    DEFAULT_SEGMENT_SIZE,
    IndexPaths,
    _read_meta,
    _stage_a_stats,
    _stage_b,
)


def _max_allocated_id(spark: SparkSession, index_dir: str) -> int:
    """Highest doc_id the index has ALLOCATED (urlmap when present —
    it records even empty docs — else the docs stats table)."""
    paths = IndexPaths(index_dir)
    urlmap = os.path.join(index_dir, "urlmap")
    src = urlmap if os.path.isdir(urlmap) else paths.docs
    row = spark.read.parquet(src).agg(F.max("doc_id")).collect()[0]
    return int(row[0]) if row[0] is not None else -1


def merge_indexes(
    spark: SparkSession,
    a_dir: str,
    b_dir: str,
    out_dir: str,
    *,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    max_salts: int = 32,
    run_id: str | None = None,
) -> dict:
    """Merge two built indexes into a fresh index at out_dir. Returns
    the merge summary (docs offset, buckets rebuilt)."""
    from search_engine_spark.plans.deletes import load_tombstones

    pa, pb = IndexPaths(a_dir), IndexPaths(b_dir)
    meta_a = _read_meta(spark, pa)
    meta_b = _read_meta(spark, pb)
    if int(meta_a["n_buckets"]) != int(meta_b["n_buckets"]):
        raise ValueError(
            f"n_buckets mismatch ({meta_a['n_buckets']} vs "
            f"{meta_b['n_buckets']}) — the term->bucket hash is a "
            "physical invariant; rebuild one side"
        )
    if bool(meta_a.get("stem", True)) != bool(meta_b.get("stem", True)):
        raise ValueError("stem flag mismatch — analyzers differ")
    for d in (a_dir, b_dir):
        if load_tombstones(d).size:
            raise ValueError(
                f"{d} has live tombstones — compact it before merging "
                "(masked postings would resurrect deleted docs)"
            )
    n_buckets = int(meta_a["n_buckets"])
    salt_threshold = int(min(
        meta_a.get("salt_threshold", 1_000_000),
        meta_b.get("salt_threshold", 1_000_000),
    ))
    run_id = run_id or uuid.uuid4().hex[:12]

    offset = _max_allocated_id(spark, a_dir) + 1

    def _merge_flat(src_a: IndexPaths, src_b: IndexPaths,
                    dst: IndexPaths) -> None:
        # each (sub-)index pair carries its OWN physical invariants —
        # fields/title may use a different bucket count than the body
        ma, mb = _read_meta(spark, src_a), _read_meta(spark, src_b)
        if int(ma["n_buckets"]) != int(mb["n_buckets"]):
            raise ValueError(
                f"n_buckets mismatch under {src_a.root} vs "
                f"{src_b.root} ({ma['n_buckets']} vs {mb['n_buckets']})"
            )
        nb = int(ma["n_buckets"])
        st = int(min(ma.get("salt_threshold", 1_000_000),
                     mb.get("salt_threshold", 1_000_000)))
        flat_a = spark.read.parquet(src_a.flat)
        flat_b = spark.read.parquet(src_b.flat).withColumn(
            "doc_id", F.col("doc_id") + F.lit(offset)
        )
        (
            flat_a.unionByName(flat_b)
            .repartition(nb, "bucket")
            .sortWithinPartitions("bucket", "term", "doc_id")
            .write.mode("overwrite").parquet(dst.flat)
        )
        _stage_a_stats(
            spark, dst, n_buckets=nb, salt_threshold=st,
            stem=bool(ma.get("stem", True)),
        )
        _stage_b(
            spark, dst, list(range(nb)),
            segment_size=segment_size, salt_threshold=st,
            max_salts=max_salts, run_id=run_id,
        )

    out = IndexPaths(out_dir)
    _merge_flat(pa, pb, out)
    touched = list(range(n_buckets))

    # field indexes share the doc_id space, so they merge with the
    # SAME offset; an asymmetric title field would leave the merged
    # index half-ranked — refuse instead of guessing
    title_a = os.path.join(a_dir, "fields", "title")
    title_b = os.path.join(b_dir, "fields", "title")
    merged_title = False
    if os.path.isdir(title_a) != os.path.isdir(title_b):
        raise ValueError(
            "one side has a fields/title index and the other does not "
            "— build the missing title field (or drop the present one) "
            "before merging"
        )
    if os.path.isdir(title_a):
        _merge_flat(
            IndexPaths(title_a), IndexPaths(title_b),
            IndexPaths(os.path.join(out_dir, "fields", "title")),
        )
        merged_title = True

    def _union_side_table(name: str, sort_col: str) -> bool:
        ta, tb = (os.path.join(d, name) for d in (a_dir, b_dir))
        if not (os.path.isdir(ta) and os.path.isdir(tb)):
            return False
        da = spark.read.parquet(ta)
        db = spark.read.parquet(tb).withColumn(
            "doc_id", F.col("doc_id") + F.lit(offset)
        )
        (
            da.unionByName(db).sort(sort_col)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, name))
        )
        return True

    merged_urlmap = _union_side_table("urlmap", "doc_id")
    merged_docstore = _union_side_table("docstore", "doc_id")
    return {
        "run_id": run_id,
        "doc_id_offset": int(offset),
        "buckets_rebuilt": len(touched),
        "urlmap_merged": merged_urlmap,
        "docstore_merged": merged_docstore,
        "title_merged": merged_title,
    }
