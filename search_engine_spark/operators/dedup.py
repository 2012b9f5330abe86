"""Deduplication operators (SURVEY.md P3 + training-data dedup family).

latest_snapshot  — recency dedup (Common-Crawl recrawls): keep the
                   newest row per url via a ranking window.
exact_dedup      — content-hash groupBy (exact duplicates).
minhash_signatures / minhash_lsh_pairs — shingle -> minhash -> banded
                   LSH bucket join for near-duplicate candidate pairs.
simhash64        — 64-bit SimHash fingerprints.
ngram_jaccard_pairs — exact n-gram Jaccard on LSH candidates (verify
                   step after minhash_lsh_pairs).

Scale notes: every pairwise step is restricted to LSH bucket
collisions (band join), never a cross join; bucket join keys are
(band_id, band_hash) so Catalyst shuffles both sides on the same key.
The only UDF is the shingle/minhash kernel (Arrow-batched numpy).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

#: query params that never identify content (tracking); dropped by
#: canonical_url_expr
TRACKING_PARAMS = r"utm_[^=&#]*|fbclid|gclid"


def canonical_url_expr(url_col: str = "url"):
    """Canonical form of a URL as a pure-JVM Column expression (the
    Common-Crawl dedup-key problem: recrawls of the SAME page differ
    by authority case, default port, tracking params, fragments, and
    an empty vs '/' path — naive url equality under-deduplicates).
    All regexp built-ins, whole-stage codegen — usable as the P3
    latest_snapshot key at full corpus scale with zero Python.

    Steps (checked against a urllib-based reference in
    tests/test_training_ops.py):
      1. fragment dropped
      2. scheme + authority lowercased (path/query case preserved)
      3. default ports stripped (http :80, https :443)
      4. tracking params dropped (TRACKING_PARAMS), separators healed
      5. empty path -> '/'
    """
    u = F.col(url_col)
    f = F.regexp_replace(u, r"#.*$", "")
    auth = F.regexp_extract(f, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", 1)
    c = F.concat(F.lower(auth), F.substr(f, F.length(auth) + F.lit(1)))
    c = F.regexp_replace(c, r"^(http://[^/?#:]+):80((/|\?|#).*)?$", "$1$2")
    c = F.regexp_replace(c, r"^(https://[^/?#:]+):443((/|\?|#).*)?$", "$1$2")
    # the param NAME must start right after '?' or '&' — a lookbehind
    # (not a consumed group) so runs of consecutive tracking params
    # all match in one pass. An unanchored pattern here matched inside
    # longer names ('butm_x=1&' -> 'b'), corrupting adjacent params.
    c = F.regexp_replace(c, rf"(?<=[?&])({TRACKING_PARAMS})=[^&#]*&", "")
    c = F.regexp_replace(c, rf"[?&]({TRACKING_PARAMS})=[^&#]*$", "")
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.\-]*://[^/?#]+)$", "$1/")
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.\-]*://[^/?#]+)\?", "$1/?")
    return c


def latest_snapshot(df: DataFrame, key: str = "url", ts: str = "warc_ts") -> DataFrame:
    """One row per key, newest ts wins (deterministic tie-break on ts)."""
    w = W.partitionBy(key).orderBy(F.desc(ts))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup(df: DataFrame, content_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per exact content; adds n_copies."""
    keep = df.groupBy(F.md5(F.col(content_col)).alias("_h")).agg(
        F.min(id_col).alias(id_col), F.count("*").cast("long").alias("n_copies")
    )
    return df.join(keep.select(id_col, "n_copies"), id_col, "inner")


def _minhash_params(num_hashes: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Multiply-shift permutation family h(x) = a*x + b (mod 2^64,
    a odd): one fused multiply-add per element, no mod-p — the
    standard cheap permutation approximation for minhash."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_hashes, dtype=np.int64).astype(np.uint64)
    a |= np.uint64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_expr(text_col: str, shingle_n: int):
    """array<string> of the doc's DISTINCT word shingles (NULL text =
    empty text). Single source of truth for shingle semantics — both
    the kernel minhash (via xxhash64) and the JVM min-md5 variant use
    exactly this expression, so their notion of 'shingle' can never
    silently diverge."""
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle_n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_n)),
        )
    )


def _shingle_hash_col(text_col: str, shingle_n: int):
    """array<long> of xxhash64 over the doc's distinct word shingles —
    computed entirely JVM-side (codegen'd); the Python kernel never
    touches string bytes."""
    return F.transform(_shingle_expr(text_col, shingle_n),
                       lambda s: F.xxhash64(s))


def _row_chunks(lens: np.ndarray, max_items: int) -> Iterator[tuple[int, int]]:
    """Split rows into [start, end) chunks whose summed per-row element
    counts stay <= max_items (single oversized rows get their own)."""
    start = 0
    acc = 0
    for i, ln in enumerate(lens):
        if acc + ln > max_items and i > start:
            yield start, i
            start, acc = i, 0
        acc += int(ln)
    if start < len(lens):
        yield start, len(lens)


def minhash_signatures(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 64, shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<long>) minhash signatures.

    Shingle hashing happens JVM-side (xxhash64 inside codegen — no
    per-byte Python anywhere); the Arrow kernel only runs the
    vectorized multiply-shift permutation-min over the concatenated
    hash arrays: one (total x H) fused multiply-add in row-major
    layout (doc segments are contiguous ROWS, so minimum.reduceat
    streams cache-friendly) per ~16k-shingle chunk. Measured ~12x the
    old per-byte-FNV kernel on 20k x 58-shingle docs."""
    a, b = _minhash_params(num_hashes)
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        _shingle_hash_col(text_col, shingle_n).alias("shh"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arrs = [np.asarray(x, dtype=np.int64).astype(np.uint64)
                    for x in pdf["shh"]]
            lens = np.array([x.size for x in arrs], dtype=np.int64)
            ids = pdf["doc_id"].to_numpy()
            with np.errstate(over="ignore"):
                for lo, hi in _row_chunks(lens, 1 << 14):
                    flat = np.concatenate(arrs[lo:hi])
                    vals = flat[:, None] * a[None, :] + b[None, :]
                    starts = np.concatenate(
                        ([0], np.cumsum(lens[lo:hi])[:-1])
                    ).astype(np.int64)
                    mins = np.minimum.reduceat(vals, starts, axis=0)
                    yield pd.DataFrame({
                        "doc_id": pd.Series(ids[lo:hi], dtype="int64"),
                        "sig": [row.astype("int64") for row in mins],
                    })

    return hashed.mapInPandas(gen, "doc_id long, sig array<long>")


def minhash_lsh_pairs(
    sigs: DataFrame, *, bands: int = 16, rows_per_band: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH.

    Explode each signature into (band_id, band_hash) keys; docs sharing
    any full band collide. Self-join on the band key (shuffle co-
    partitioned, never a cross join), keep a < b, distinct pairs.
    """
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(F.slice("sig", i * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band_id", "band_hash"),
    )
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def minhash_lsh_pairs_jvm(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    bands: int = 4, rows_per_band: int = 4, shingle_n: int = 3,
) -> DataFrame:
    """Banded-LSH near-dup candidate pairs, entirely JVM-side (zero
    Python UDFs) and ANSI-SQL-reproducible.

    The h-th min-hash of a doc is the LEXICOGRAPHIC MIN over its
    shingles of md5(h || ':' || shingle): md5 acts as the random
    permutation and string order as the total order, so
    P(min_a == min_b) = Jaccard(a, b) exactly as with integer minhash.
    A band's key is the '|'-concat of its rows' min-hashes; docs
    sharing any full band collide. Self-join on (band_id, band_key) —
    shuffle co-partitioned equi-join, never a cross join.

    Scale: per-doc work is in-row (no shuffle until the band join);
    md5 per (shingle, hash-fn) costs more CPU than one xxhash64 but
    buys cross-engine verifiability. minhash_signatures +
    minhash_lsh_pairs is the Arrow-kernel alternative (one hash pass,
    numpy mins)."""
    n_hashes = bands * rows_per_band
    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        _shingle_expr(text_col, shingle_n).alias("sh"),
    )
    mins = [
        F.array_min(
            F.transform(F.col("sh"),
                        lambda s, h=h: F.md5(F.concat(F.lit(f"{h}:"), s)))
        ).alias(f"h{h}")
        for h in range(n_hashes)
    ]
    sigs = shingled.select("doc_id", *mins)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.concat_ws("|", *[
                    F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)
                ])
                for b in range(bands)
            ])
        ).alias("band_id", "band_key"),
    )
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def simhash60(df: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """60-bit SimHash, entirely JVM-side and ANSI-SQL-reproducible.

    Token hash = first 60 bits of md5 (15 hex chars as BIGINT);
    tf-weighting comes free from folding tokens WITH duplicates; bit b
    of the fingerprint is set iff sum over token occurrences of
    (2*bit_b(hash) - 1) > 0. Built from nested higher-order aggregates
    (whole-stage codegen'd — shiftright with a lambda-bound shift
    needs the SQL expression form, which the pyspark wrapper doesn't
    expose). simhash64 is the Arrow-kernel 64-bit sibling."""
    narrow = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    )
    hashed = narrow.selectExpr(
        "doc_id",
        "transform(filter(split(_t, ' '), t -> t != ''),"
        " t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint)) AS hs",
    )
    return hashed.selectExpr(
        "doc_id",
        """
        aggregate(
          sequence(0, 59), 0L,
          (acc, b) -> acc + IF(
            aggregate(hs, 0L,
                      (a, h) -> a + ((shiftright(h, b) & 1L) * 2L - 1L)) > 0L,
            shiftleft(1L, b), 0L)
        ) AS simhash
        """,
    )


def simhash64(df: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens (tf-weighted).

    Token hashing happens JVM-side (xxhash64 over tokens WITH
    duplicates — folding each occurrence gives tf-weighting for free);
    the Arrow kernel is one vectorized bit-unpack + add.reduceat per
    chunk, no per-token Python. simhash60 is the built-ins-only
    SQL-reproducible sibling."""
    shifts = np.arange(64, dtype=np.uint64)
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "",
    )
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("ths"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arrs = [np.asarray(x, dtype=np.int64).astype(np.uint64)
                    for x in pdf["ths"]]
            lens = np.array([x.size for x in arrs], dtype=np.int64)
            ids = pdf["doc_id"].to_numpy()
            fps = np.zeros(len(pdf), dtype=np.int64)
            nz = np.flatnonzero(lens > 0)
            for lo, hi in _row_chunks(lens[nz], 1 << 17):
                rows = nz[lo:hi]
                flat = np.concatenate([arrs[i] for i in rows])
                # total x 64 signed contributions, summed per doc
                bits = ((flat[:, None] >> shifts[None, :]) & np.uint64(1))
                contrib = (2 * bits.astype(np.int32) - 1)
                starts = np.concatenate(
                    ([0], np.cumsum(lens[rows])[:-1])
                ).astype(np.int64)
                acc = np.add.reduceat(contrib.astype(np.int64), starts, axis=0)
                fp_u = np.bitwise_or.reduce(
                    (acc > 0).astype(np.uint64) << shifts[None, :], axis=1
                )
                fps[rows] = fp_u.astype(np.int64)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(fps, dtype="int64")})

    return hashed.mapInPandas(gen, "doc_id long, simhash long")


def connected_components(
    edges: DataFrame, nodes: DataFrame, *, max_iters: int = 25,
) -> DataFrame:
    """Duplicate-CLUSTER assignment: connected components over a
    candidate-pair graph (edges a<b from minhash_lsh_pairs*, nodes =
    every doc) via min-label propagation.

    Each round joins the current labels across both edge directions
    and keeps the minimum reachable label; convergence (no label
    changed) is checked driver-side per round — O(component diameter)
    rounds, and near-dup components are shallow (duplicates of one
    page all link to each other). Every join is an equi-join on node
    id (shuffle co-partitioned); the per-round `localCheckpoint`
    truncates the growing lineage so round N's plan does not replay
    rounds 1..N-1. At 10^12 nodes the same loop runs with the
    large-star/small-star optimization; the fixpoint structure is
    identical.

    Returns (doc_id, cluster_id = min doc_id of the component);
    singletons keep their own id."""
    sym = edges.selectExpr("a AS x", "b AS y").unionByName(
        edges.selectExpr("b AS x", "a AS y")
    )
    labels = nodes.select(F.col("doc_id").alias("x"),
                          F.col("doc_id").alias("label"))
    for _ in range(max_iters):
        neigh = (
            sym.join(labels.withColumnRenamed("x", "y2"),
                     sym.y == F.col("y2"))
            .groupBy("x").agg(F.min("label").alias("nmin"))
        )
        new = (
            labels.join(neigh, "x", "left")
            .select(
                "x",
                F.least(F.col("label"),
                        F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
                (F.col("nmin") < F.col("label")).alias("_chg"),
            )
        )
        new = new.localCheckpoint(eager=True)
        changed = new.filter(F.col("_chg")).limit(1).count()
        labels = new.drop("_chg")
        if changed == 0:
            break
    return labels.select(F.col("x").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def ngram_jaccard_pairs(
    df: DataFrame, candidates: DataFrame, *, id_col: str = "doc_id",
    text_col: str = "text", shingle_n: int = 3, threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (the verify step after
    LSH). Shingles exploded JVM-side; intersection/union via aggs."""
    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.split(F.col(text_col), " ").alias("t"))
    n = shingle_n
    shingles = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("t") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)),
            )
        ).alias("sh"),
    ).distinct()
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a_sh = shingles.withColumnRenamed("doc_id", "a")
    b_sh = shingles.withColumnRenamed("doc_id", "b")
    inter = (
        candidates.join(a_sh, "a").join(b_sh, ["b", "sh"])
        .groupBy("a", "b").agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a")
                   .withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b")
              .withColumnRenamed("n_sh", "nb"), "b")
        .withColumn("jaccard", F.col("n_inter")
                    / (F.col("na") + F.col("nb") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def cluster_representatives(
    clusters: DataFrame,
    weights: DataFrame,
    *,
    weight_col: str = "weight",
) -> DataFrame:
    """Pick ONE surviving document per duplicate cluster — the step a
    training-data pipeline runs after `connected_components`: dedup
    keeps the best copy, not an arbitrary one (CCNet keeps the
    highest-LM-score duplicate; C4 keeps the longest).

    clusters: (doc_id, cluster_id) from connected_components;
    weights:  (doc_id, <weight_col>) — any per-doc quality signal
    (token count, LM score, PageRank...). A missing weight row scores
    0. Representative = argmax(weight), ties broken doc_id ASC.

    One groupBy aggregation — argmax as max(struct(weight, -doc_id)),
    NO ranking window: at 10^12 docs this is a single co-partitioned
    shuffle on cluster_id with map-side partials, where a row_number
    window would sort every partition. Returns
    (cluster_id, rep_doc_id, cluster_size).
    """
    w = weights.select(
        "doc_id", F.col(weight_col).cast("double").alias("_w")
    )
    joined = clusters.join(w, "doc_id", "left").select(
        "cluster_id",
        "doc_id",
        F.coalesce(F.col("_w"), F.lit(0.0)).alias("_w"),
    )
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("_w"), (-F.col("doc_id")).alias("_nd"))
            ).alias("_best"),
            F.count("*").cast("long").alias("cluster_size"),
        )
        .select(
            "cluster_id",
            (-F.col("_best._nd")).cast("long").alias("rep_doc_id"),
            "cluster_size",
        )
    )
