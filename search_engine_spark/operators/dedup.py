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

_MERSENNE = (1 << 61) - 1


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
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < n:
        shingles = {" ".join(toks)} if toks else set()
    else:
        shingles = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    if not shingles:
        return np.zeros(1, dtype=np.uint64)
    # Python's hash is salted per-process; use a stable FNV-1a instead
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        h = np.uint64(1469598103934665603)
        for byte in s.encode():
            h = np.uint64((int(h) ^ byte) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def minhash_signatures(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 64, shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<long>) — Arrow-batched numpy minhash kernel."""
    a, b = _minhash_params(num_hashes)
    narrow = df.select(id_col, text_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sh = _shingle_hashes(text or "", shingle_n)
                # (a*x + b) mod p, min over shingles, per hash function
                vals = (
                    (sh[None, :] % _MERSENNE) * (a[:, None] % _MERSENNE) + b[:, None]
                ) % _MERSENNE
                sigs.append(vals.min(axis=1).astype("int64"))
                ids.append(did)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "sig": sigs})

    return narrow.mapInPandas(gen, "doc_id long, sig array<long>")


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
    toks = F.split(F.col(text_col), " ")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle_n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_n)),
        )
    )
    shingled = df.select(F.col(id_col).alias("doc_id"), sh.alias("sh"))
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
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
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
    """64-bit SimHash over whitespace tokens (tf-weighted)."""
    narrow = df.select(id_col, text_col)

    shifts = np.arange(64, dtype=np.uint64)

    def _fnv64(s: str) -> int:
        h = 1469598103934665603
        for byte in s.encode():
            h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        return h

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in batches:
            ids, hashes = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                counts = Counter((text or "").split())
                acc = np.zeros(64, dtype=np.int64)
                if counts:
                    hs = np.array([_fnv64(t) for t in counts], dtype=np.uint64)
                    ws = np.array(list(counts.values()), dtype=np.int64)
                    bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
                    acc = ((2 * bits - 1) * ws[:, None]).sum(axis=0)
                fp_u = np.uint64(0)
                for i in np.flatnonzero(acc > 0):
                    fp_u |= np.uint64(1) << np.uint64(i)
                # reinterpret as signed two's-complement -> Spark long
                fp = int(fp_u.astype(np.int64))
                ids.append(did)
                hashes.append(fp)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(hashes, dtype="int64")})

    return narrow.mapInPandas(gen, "doc_id long, simhash long")


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
