"""Materialized inverted index build (SURVEY.md section 3.1, M2/M3).

Two checkpointed stages, both single Spark jobs over ALL pending work
(no driver-side per-bucket loop — at 1000 executors the scheduler, not
the driver, spreads the buckets):

Stage A — tokenize + stats (one pass over the corpus):
    pages/documents -> fused mapInPandas text kernel (map-side tf
    combine) -> postings_flat parquet PARTITIONED BY bucket
    (bucket = pmod(xxhash64(term), n_buckets) — the physical layout IS
    the query-time partition-pruning structure), plus docs / dictionary
    (exact df, cf) / stats (n_docs, avgdl) tables.

Stage B — segment + compress (shuffle on (term, salt)):
    read pending buckets (partition-pruned) -> salt hot terms (df above
    threshold; salt = pmod(xxhash64(doc_id), n_salts) so one stopword's
    postings spread over n_salts tasks — SURVEY.md section 4, stopword-
    skew row) -> repartition(term, salt) -> sortWithinPartitions
    (bucket, term, salt, doc_id) -> streaming segmenter mapInPandas
    (fixed-size segments, delta-gap + varint blobs, per-segment
    max_tfnorm for block-max WAND) -> parquet partitionBy(bucket) with
    dynamic partition overwrite (idempotent re-runs) -> manifest rows.

Memory safety at 10^12 docs: the segmenter streams Arrow batches and
never holds more than one partial segment per live (term, salt) group;
the sort spills via UnsafeExternalSorter; hot groups are bounded by
salting. doclen is carried into the segments (doclens blob) so query
scoring and WAND need NO doc-side join (SURVEY.md J4 'preferred').
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from search_engine_spark import B, K1
from search_engine_spark.functions.codec import encode_postings, encode_varints
from search_engine_spark.operators.aggregates import postings_from_text
from search_engine_spark.plans.manifest import Manifest

SEGMENT_SCHEMA = (
    "bucket int, term string, salt int, seg int, n int, doc_ids binary,"
    " tfs binary, doclens binary, max_tfnorm double, first_doc long,"
    " last_doc long, n_bytes int"
)

DEFAULT_SEGMENT_SIZE = 4096


def _bucket_expr(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


class IndexPaths:
    def __init__(self, index_dir: str):
        self.root = index_dir
        self.flat = os.path.join(index_dir, "postings_flat")
        self.postings = os.path.join(index_dir, "postings")
        self.dictionary = os.path.join(index_dir, "dictionary")
        self.docs = os.path.join(index_dir, "docs")
        self.stats = os.path.join(index_dir, "stats")
        self.hot_terms = os.path.join(index_dir, "hot_terms")
        self.meta = os.path.join(index_dir, "index_meta.json")


def _stage_a(
    spark: SparkSession,
    source: DataFrame,
    paths: IndexPaths,
    *,
    n_buckets: int,
    stem: bool,
    id_col: str,
    text_col: str,
    html_col: str | None,
    salt_threshold: int,
) -> None:
    flat = postings_from_text(
        source, id_col=id_col, text_col=text_col, html_col=html_col, stem=stem
    ).withColumn("bucket", _bucket_expr(F.col("term"), n_buckets))
    # One wide pass, ZERO shuffle: each tokenize task writes exactly one
    # file, locally sorted by (bucket, term) so resume/extend reads
    # prune to pending buckets via parquet row-group statistics (and
    # the sorted bucket column RLE-encodes to ~nothing on disk). The
    # previous design repartition(n_buckets).partitionBy(bucket)-ed
    # here for hive-directory pruning — a full extra shuffle of the
    # FATTEST table in the pipeline (tokenized postings with term
    # strings, 53% of total shuffle bytes measured at 120k docs) spent
    # on pruning that row-group stats provide for free.
    flat.sortWithinPartitions("bucket", "term").write.mode(
        "overwrite"
    ).parquet(paths.flat)
    _stage_a_stats(spark, paths, n_buckets=n_buckets,
                   salt_threshold=salt_threshold)


def _stage_a_stats(
    spark: SparkSession,
    paths: IndexPaths,
    *,
    n_buckets: int,
    salt_threshold: int,
) -> None:
    """Derive dictionary / docs / stats / hot_terms / meta from the
    (possibly appended-to) flat postings — shared by the fresh build
    and extend_index."""
    flat = spark.read.parquet(paths.flat)
    dictionary = flat.groupBy("term", "bucket").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    # bucket-partitioned, one file per bucket, term-sorted within the
    # file: query-time term lookups prune to the term's bucket dir and
    # then to the matching parquet row groups (J1 at scale)
    (
        dictionary.repartition(n_buckets, "bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(paths.dictionary)
    )

    docs = flat.select("doc_id", "doclen").dropDuplicates(["doc_id"])
    docs.write.mode("overwrite").parquet(paths.docs)

    stats = spark.read.parquet(paths.docs).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(paths.stats)

    # Hot/common-term sketch for stage-B salting AND dictionary
    # encoding (SURVEY.md section 4): the df-histogram head lives with
    # the index so stage B needs no full dictionary scan. EVERY term
    # above the salt threshold is kept (skew protection must never be
    # capped away); the encode-extension band below it (down to 1/64 of
    # the salt threshold — the Zipf head carrying most posting rows) is
    # capped at 65536 terms to bound the broadcast.
    d = spark.read.parquet(paths.dictionary)
    must_salt = d.filter(F.col("df") > salt_threshold).select("term", "df")
    enc_band = (
        d.filter(
            (F.col("df") > max(salt_threshold // 64, 16))
            & (F.col("df") <= salt_threshold)
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(65536)
        .select("term", "df")
    )
    (
        must_salt.unionByName(enc_band)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(paths.hot_terms)
    )

    # Collection constants -> driver-side JSON: stage B and the query
    # paths read these without paying a Spark job each.
    import json

    import pyarrow.parquet as _pq

    st = _pq.read_table(paths.stats).to_pylist()[0]
    with open(paths.meta, "w") as f:
        json.dump(
            {
                "n_buckets": n_buckets,
                "n_docs": int(st["n_docs"]),
                "avgdl": float(st["avgdl"]),
                "salt_threshold": salt_threshold,
            },
            f,
        )


def _read_meta(spark: SparkSession, paths: IndexPaths) -> dict:
    """Collection constants. meta JSON is written by stage A; the
    fallback recomputes from the tables (pre-meta indexes)."""
    import json

    if os.path.exists(paths.meta):
        with open(paths.meta) as f:
            return json.load(f)
    stats = spark.read.parquet(paths.stats).collect()[0]
    n_buckets = 1 + int(
        spark.read.parquet(paths.dictionary).agg(F.max("bucket")).collect()[0][0]
    )
    return {
        "n_buckets": n_buckets,
        "n_docs": int(stats.n_docs),
        "avgdl": float(stats.avgdl),
    }


_SALT_CAP = 128  # ekey = enc_id * _SALT_CAP + salt; must exceed max_salts


def _make_segmenter(segment_size: int, avgdl: float, n_buckets: int,
                    id2term_bc):
    """Streaming segmenter over SLIM shuffle rows.

    Input columns (exactly what crosses the stage-B shuffle — see
    _stage_b): 4 UnsafeRow fields per posting, none of them a hash.
      ekey   — enc_id * _SALT_CAP + salt for Zipf-head terms (enc_id
               from the broadcast dictionary; salted terms are always
               encoded since the salt threshold >= the encode
               threshold), or -1 for tail terms (whose salt is always
               0). Low-entropy: compresses to ~nothing.
      term_s — the term string, ONLY for tail (ekey == -1) rows.
      doc_id, tfdl — the posting; tfdl = tf<<32 | doclen packed into
               one long (one UnsafeRow field instead of two).
    bucket never ships: it is recomputed PER GROUP here via the
    driver-side XXH64 (functions.hashing — fuzz-tested bit-equal to
    the JVM's xxhash64), pmod n_buckets. The former per-row
    _tkey=xxhash64(term) column is gone too — it was 8 incompressible
    bytes on every row; sorting leads with ekey (int compare) and only
    tail rows ever pay a string compare.
    """
    k1, b = K1, B

    def tfnorm(tf: np.ndarray, dl: np.ndarray) -> np.ndarray:
        tff = tf.astype(np.float64)
        return tff * (k1 + 1.0) / (tff + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))

    def segment_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from search_engine_spark.functions.hashing import term_bucket

        id2term = id2term_bc.value
        out_rows: list[tuple] = []
        cur_key: tuple | None = None
        cur_term: str | None = None
        cur_salt = 0
        cur_seg = 0
        buf_d: list[np.ndarray] = []
        buf_t: list[np.ndarray] = []
        buf_l: list[np.ndarray] = []
        buf_n = 0

        def emit(doc: np.ndarray, tf: np.ndarray, dl: np.ndarray) -> None:
            nonlocal cur_seg
            dblob, tblob = encode_postings(doc, tf)
            lblob = encode_varints(dl.astype(np.uint64))
            # n_bytes denormalized so the manifest metrics pass reads a
            # pruned int column instead of decompressing every blob
            out_rows.append(
                (
                    int(cur_bucket), cur_term, int(cur_salt), int(cur_seg),
                    int(doc.size), dblob, tblob, lblob,
                    float(tfnorm(tf, dl).max()), int(doc[0]), int(doc[-1]),
                    len(dblob) + len(tblob) + len(lblob),
                )
            )
            cur_seg += 1

        def flush_full(final: bool) -> None:
            nonlocal buf_d, buf_t, buf_l, buf_n
            if buf_n == 0:
                return
            d = np.concatenate(buf_d) if len(buf_d) > 1 else buf_d[0]
            t = np.concatenate(buf_t) if len(buf_t) > 1 else buf_t[0]
            l = np.concatenate(buf_l) if len(buf_l) > 1 else buf_l[0]
            pos = 0
            n = d.size
            while n - pos >= segment_size or (final and pos < n):
                end = min(pos + segment_size, n)
                emit(d[pos:end], t[pos:end], l[pos:end])
                pos = end
            if pos < n:
                buf_d, buf_t, buf_l = [d[pos:]], [t[pos:]], [l[pos:]]
                buf_n = n - pos
            else:
                buf_d, buf_t, buf_l = [], [], []
                buf_n = 0

        cur_bucket = -1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ekeys = pdf["ekey"].to_numpy()
            terms = pdf["term_s"].to_numpy()
            docs = pdf["doc_id"].to_numpy()
            tfdl = pdf["tfdl"].to_numpy()
            tfs = (tfdl >> 32).astype(np.int64)
            dls = (tfdl & 0xFFFFFFFF).astype(np.int64)
            # contiguous (term, salt) runs within the sorted batch
            change = np.empty(len(pdf), dtype=bool)
            change[0] = True
            change[1:] = (ekeys[1:] != ekeys[:-1]) | (terms[1:] != terms[:-1])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(pdf))
            for s, e in zip(starts, ends):
                ekey = int(ekeys[s])
                key = (ekey, terms[s])
                if key != cur_key:
                    flush_full(final=True)
                    cur_key = key
                    if ekey >= 0:
                        cur_term = id2term[ekey // _SALT_CAP]
                        cur_salt = ekey % _SALT_CAP
                    else:
                        cur_term = terms[s]
                        cur_salt = 0
                    cur_bucket = term_bucket(cur_term, n_buckets)
                    cur_seg = 0
                buf_d.append(docs[s:e])
                buf_t.append(tfs[s:e])
                buf_l.append(dls[s:e])
                buf_n += e - s
                if buf_n >= segment_size:
                    flush_full(final=False)
            if len(out_rows) >= 1000:
                yield pd.DataFrame(
                    out_rows,
                    columns=[
                        "bucket", "term", "salt", "seg", "n", "doc_ids",
                        "tfs", "doclens", "max_tfnorm", "first_doc", "last_doc", "n_bytes",
                    ],
                )
                out_rows = []
        flush_full(final=True)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "bucket", "term", "salt", "seg", "n", "doc_ids",
                    "tfs", "doclens", "max_tfnorm", "first_doc", "last_doc", "n_bytes",
                ],
            )

    return segment_partition


def _stage_b(
    spark: SparkSession,
    paths: IndexPaths,
    pending_buckets: list[int],
    *,
    segment_size: int,
    salt_threshold: int,
    max_salts: int,
    run_id: str,
) -> None:
    t0 = time.time()
    meta = _read_meta(spark, paths)
    avgdl = float(meta["avgdl"])
    n_buckets_total = int(meta["n_buckets"])

    flat = spark.read.parquet(paths.flat).filter(
        F.col("bucket").isin(pending_buckets)  # partition pruning
    )
    # Zipf-head sketch, read driver-side (no Spark job), serving two
    # jobs in one broadcast join:
    #  - SALTING (stopword skew): n_salts = ceil(df / salt_threshold),
    #    capped, for the genuinely hot terms;
    #  - DICTIONARY ENCODING of the shuffle: every sketch term gets a
    #    dense enc_id so its STRING never crosses the wire — by Zipf,
    #    this head carries most posting rows, so shuffle bytes drop
    #    even though the tail keeps its strings.
    import pyarrow.parquet as _pq

    hot_tbl = _pq.read_table(paths.hot_terms).to_pylist()
    hot_tbl.sort(key=lambda r: (-int(r["df"]), r["term"]))
    enc_rows = []
    id2term: dict[int, str] = {}
    for i, r in enumerate(hot_tbl):
        df_ = int(r["df"])
        n_salts = (
            min(-(-df_ // salt_threshold), max_salts)
            if df_ > salt_threshold else 1
        )
        enc_rows.append((r["term"], i, n_salts))
        id2term[i] = r["term"]
    if enc_rows:
        enc = spark.createDataFrame(enc_rows, "term string, enc_id int, n_salts int")
        joined = flat.join(F.broadcast(enc), "term", "left")
    else:
        joined = flat.withColumn("enc_id", F.lit(None).cast("int")).withColumn(
            "n_salts", F.lit(None).cast("int")
        )
    # Slim shuffle row (see _make_segmenter for the decode contract):
    # 4 fields per posting, NO hash column and NO string for head
    # terms. ekey packs (enc_id, salt); tfdl packs (tf, doclen);
    # bucket is recomputed group-side from the term itself. Leading the
    # sort with ekey keeps the big external sort comparing int64s for
    # every head row; only tail rows (ekey = -1) fall through to the
    # string comparator.
    slim = (
        joined.withColumn(
            "salt",
            F.when(
                F.col("n_salts") > 1,
                F.pmod(F.xxhash64("doc_id"), F.col("n_salts")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "ekey",
            F.when(
                F.col("enc_id").isNotNull(),
                F.col("enc_id").cast("long") * F.lit(_SALT_CAP)
                + F.col("salt").cast("long"),
            ).otherwise(F.lit(-1).cast("long")),
        )
        .withColumn(
            "term_s",
            F.when(F.col("ekey") >= 0, F.lit(None).cast("string"))
            .otherwise(F.col("term")),
        )
        .withColumn(
            "tfdl",
            F.col("tf").cast("long") * F.lit(1 << 32).cast("long")
            + F.col("doclen").cast("long"),
        )
        .select("ekey", "term_s", "doc_id", "tfdl")
    )
    n_parts = max(spark.sparkContext.defaultParallelism * 2, len(pending_buckets))
    id2term_bc = spark.sparkContext.broadcast(id2term)
    segmenter = _make_segmenter(segment_size, avgdl, n_buckets_total, id2term_bc)
    segments = (
        slim.repartition(n_parts, "ekey", "term_s")
        .sortWithinPartitions("ekey", "term_s", "doc_id")
        .mapInPandas(segmenter, SEGMENT_SCHEMA)
    )
    # Second (cheap) shuffle of the already-compressed segment rows so
    # each bucket directory gets ONE file instead of n_parts files —
    # segments are ~100x smaller than flat postings, and the WAND
    # reader's footer seek index wants few files with term-sorted row
    # groups. Small row groups (1 MiB) keep per-term reads tight: a
    # query term decompresses ~one row group, not a whole file.
    segments = (
        segments.repartition(max(len(pending_buckets), 1), "bucket")
        .sortWithinPartitions("term", "salt", "seg")
    )
    (
        segments.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("parquet.block.size", str(1024 * 1024))
        .partitionBy("bucket")
        .parquet(paths.postings)
    )
    wall = time.time() - t0

    # lineage metrics per bucket, read back from the committed segments
    seg = spark.read.parquet(paths.postings).filter(
        F.col("bucket").isin(pending_buckets)
    )
    metrics = (
        seg.groupBy("bucket")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("n").cast("long").alias("n_postings"),
            F.count("*").cast("long").alias("n_segments"),
            F.sum("n_bytes").cast("long").alias("bytes"),
        )
        .collect()
    )
    by_bucket = {r.bucket: r for r in metrics}
    now = __import__("datetime").datetime.now(__import__("datetime").timezone.utc)
    rows = []
    for bkt in pending_buckets:
        r = by_bucket.get(bkt)
        rows.append(
            (
                run_id, int(bkt), "done",
                int(r.n_terms) if r else 0,
                int(r.n_postings) if r else 0,
                int(r.n_segments) if r else 0,
                int(r.bytes) if r else 0,
                wall / max(len(pending_buckets), 1),
                now,
            )
        )
    Manifest(spark, paths.root).append(rows)


def build_index(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    *,
    n_buckets: int = 64,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    stem: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    html_col: str | None = None,
    salt_threshold: int = 1_000_000,
    max_salts: int = 32,
    resume: bool = False,
    limit_buckets: int | None = None,
    run_id: str | None = None,
) -> dict:
    """Build (or resume) the compressed inverted index at index_dir.

    limit_buckets: process at most this many pending buckets in stage B
    (failure-injection hook for the resume tests — a crashed cluster
    looks exactly like a partial bucket set plus a manifest).
    Returns a summary dict.
    """
    paths = IndexPaths(index_dir)
    run_id = run_id or uuid.uuid4().hex[:12]

    if not resume and os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    stage_a_done = resume and all(
        os.path.exists(os.path.join(p, "_SUCCESS"))
        for p in (paths.flat, paths.dictionary, paths.docs, paths.stats)
    )
    if not stage_a_done:
        _stage_a(
            spark, source, paths,
            n_buckets=n_buckets, stem=stem,
            id_col=id_col, text_col=text_col, html_col=html_col,
            salt_threshold=salt_threshold,
        )

    manifest = Manifest(spark, index_dir)
    n_all = int(_read_meta(spark, paths)["n_buckets"])
    if manifest.exists():
        all_buckets = spark.createDataFrame(
            [(b,) for b in range(n_all)], "bucket int"
        )
        pending_df = manifest.pending(all_buckets)  # J5 anti-join
        pending = sorted(r.bucket for r in pending_df.collect())
    else:
        pending = list(range(n_all))  # fresh build: no manifest scan
    if limit_buckets is not None:
        pending = pending[:limit_buckets]
    if pending:
        _stage_b(
            spark, paths, pending,
            segment_size=segment_size, salt_threshold=salt_threshold,
            max_salts=max_salts, run_id=run_id,
        )
    return {
        "run_id": run_id,
        "buckets_built": len(pending),
        "stage_a_skipped": stage_a_done,
    }


def extend_index(
    spark: SparkSession,
    new_source: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    html_col: str | None = None,
    stem: bool = True,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    max_salts: int = 32,
    run_id: str | None = None,
) -> dict:
    """Incrementally add documents to an existing index and converge to
    the index a full rebuild over the union corpus would produce.

    Mechanics: tokenize ONLY the new docs and append their postings to
    the flat table's bucket partitions; recompute the derived tables
    (dictionary/docs/stats/hot_terms/meta) from the full flat; mark the
    touched buckets invalidated in the manifest; re-run stage B for
    exactly those buckets (dynamic partition overwrite regenerates each
    touched bucket from the full old+new flat rows — untouched buckets'
    segments keep their original doclen normalization only if avgdl is
    unchanged, so stage B is re-run for ALL buckets whenever avgdl
    moves materially; BM25's length normalization depends on the
    collection-wide avgdl).

    doc_ids of new docs must not collide with existing ones (caller
    offsets by meta['n_docs'] — see operators.ids.assign_dense_ids).
    """
    paths = IndexPaths(index_dir)
    run_id = run_id or uuid.uuid4().hex[:12]
    meta = _read_meta(spark, paths)
    n_buckets = int(meta["n_buckets"])
    salt_threshold = int(meta.get("salt_threshold", 1_000_000))
    old_avgdl = float(meta["avgdl"])

    new_flat = postings_from_text(
        new_source, id_col=id_col, text_col=text_col, html_col=html_col,
        stem=stem,
    ).withColumn("bucket", _bucket_expr(F.col("term"), n_buckets))
    # same zero-shuffle layout as _stage_a: new files are also
    # (bucket, term)-sorted, so bucket row-group pruning keeps working.
    # (An index built before this layout has hive bucket=* dirs — keep
    # appending in ITS layout so one flat table never mixes both.)
    old_layout = any(
        p.startswith("bucket=") for p in os.listdir(paths.flat)
    )
    if old_layout:  # pragma: no cover - upgrade path for old indexes
        (
            new_flat.repartition(n_buckets, "bucket")
            .write.mode("append").partitionBy("bucket").parquet(paths.flat)
        )
    else:
        new_flat.sortWithinPartitions("bucket", "term").write.mode(
            "append"
        ).parquet(paths.flat)
    _stage_a_stats(spark, paths, n_buckets=n_buckets,
                   salt_threshold=salt_threshold)

    new_avgdl = float(_read_meta(spark, paths)["avgdl"])
    if abs(new_avgdl - old_avgdl) / max(old_avgdl, 1e-9) > 1e-12:
        # avgdl moved: every segment's baked tfnorm bound and the
        # score normalization change -> rebuild all buckets
        touched = list(range(n_buckets))
    else:  # pragma: no cover - only when avgdl is exactly preserved
        touched = sorted(
            int(r.bucket)
            for r in spark.read.parquet(paths.flat).select("bucket")
            .distinct().collect()
        )
    manifest = Manifest(spark, index_dir)
    if manifest.exists():
        manifest.invalidate(touched, run_id)
    _stage_b(
        spark, paths, touched,
        segment_size=segment_size, salt_threshold=salt_threshold,
        max_salts=max_salts, run_id=run_id,
    )
    return {"run_id": run_id, "buckets_rebuilt": len(touched)}
