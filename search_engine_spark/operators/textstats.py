"""Text-analysis operators for training-data pipelines.

All hot paths are JVM-side built-ins (whole-stage codegen) — no Python
UDFs anywhere in this module.

- token_stats     — token/char counts + ratios (pure built-ins).
- quality_signals — length / punctuation / stopword / uniqueness
                    heuristics, composable into a quality score.
- lang_id         — character-bigram profile cosine against small
                    per-language profiles as a pure DataFrame plan
                    (explode + broadcast join + window); a trained
                    model would slot in as a mapInPandas kernel with
                    the same output schema.
- fingerprint     — 64-bit content hash (xxhash64, engine-internal);
  fingerprint_md5 — portable 60-bit variant (ANSI-SQL-reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "to", "and")

# tiny deterministic bigram profiles (would be trained offline; frozen
# here so results are reproducible without external data)
_LANG_PROFILES = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "ou", "ai", "it"],
    "es": ["de", "en", "os", "es", "ar", "la", "el", "ra", "as", "ci"],
    "de": ["en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge"],
}


# GPT-2-style pretokenizer pattern (BPE-ish subword unit boundaries):
# contractions, optionally-space-prefixed letter runs, digit runs,
# punctuation runs. Counts per doc approximate an LLM tokenizer's token
# count far better than whitespace splitting (no merges table needed
# for counting boundaries). Uses only \p{L}/\p{N} classes so the same
# pattern runs JVM-side (java.util.regex) and in DuckDB (RE2).
BPE_PRETOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_stats(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Whitespace token count, BPE-ish subword-unit count, char count,
    avg token length — built-ins only (split/size/length/
    regexp_extract_all are codegen'd; no UDF)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0))
        .cast("long").alias("n_subtokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(
            F.when(F.size(toks) > 0,
                   F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t))
                   / F.size(toks)).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


def quality_signals(df: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-doc quality heuristics (all built-ins):
    stopword ratio, distinct-token ratio, mean token length."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.round(F.when(n > 0, n_stop / n).otherwise(0.0), 6).alias("stopword_ratio"),
        F.round(F.when(n > 0, n_distinct / n).otherwise(0.0), 6).alias("distinct_ratio"),
    )


def fingerprint(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint via Spark's xxhash64 (JVM-side) plus a
    normalized variant (whitespace-collapsed) for near-exact matching."""
    norm = F.array_join(F.filter(F.split(F.col(text_col), " "),
                                 lambda t: t != ""), " ")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.xxhash64(F.col(text_col)).alias("fp_raw"),
        F.xxhash64(norm).alias("fp_norm"),
    )


def fingerprint_md5(df: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Portable 60-bit content fingerprints: first 15 hex chars of md5
    as a BIGINT (raw + whitespace-normalized). Same dedup semantics as
    `fingerprint` but reproducible in ANSI SQL (md5 exists everywhere;
    xxhash64 does not) — this is the cross-engine/oracle variant; the
    xxhash64 one stays the engine-internal scale path (one JVM hash)."""
    norm = F.array_join(F.filter(F.split(F.col(text_col), " "),
                                 lambda t: t != ""), " ")

    def fp(c):
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    return df.select(
        F.col(id_col).alias("doc_id"),
        fp(F.col(text_col)).alias("fp_raw"),
        fp(norm).alias("fp_norm"),
    )


def lang_profile_rows() -> list[tuple[str, str, int]]:
    """(gram, lang, weight) rows of the frozen profiles — weight is
    10..1 by profile rank, so every profile's L2 norm is sqrt(385)."""
    rows = []
    for lang in sorted(_LANG_PROFILES):
        prof = _LANG_PROFILES[lang]
        for rank, g in enumerate(prof):
            rows.append((g, lang, len(prof) - rank))
    return rows


# every profile has weights 10..1 -> identical L2 norm sqrt(385); the
# cosine denominator's profile part is therefore this one constant
PROFILE_NORM_SQ = 385.0


def lang_id(df: DataFrame, *, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Character-bigram heuristic language ID — pure DataFrame plan
    (explode bigrams -> broadcast-join the tiny profile table -> keyed
    aggregation -> ranking window), no Python in the hot path and fully
    ANSI-SQL-reproducible. Cosine math: dot(counts, profile) is an
    exact integer; denominator = ||counts over profile grams|| *
    sqrt(385); prediction = argmax by (dot desc, lang asc); docs with
    no profile bigrams -> ('und', 0.0)."""
    import math

    spark = df.sparkSession
    prof = spark.createDataFrame(
        lang_profile_rows(), "gram string, lang string, weight int"
    )
    t = F.lower(F.col(text_col))
    n = F.length(t)
    big = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(
                n >= 2,
                F.transform(F.sequence(F.lit(1), n - 1),
                            lambda i: F.substring(t, i, F.lit(2))),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    counts = (
        big.join(F.broadcast(prof.select("gram").distinct()), "gram")
        .groupBy("doc_id", "gram")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    norms = counts.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("nv")
    )
    dots = (
        counts.join(F.broadcast(prof), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("cnt") * F.col("weight")).cast("long").alias("dot"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("dot"), F.asc("lang"))
    best = dots.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    scored = best.join(norms, "doc_id").select(
        "doc_id",
        F.col("lang").alias("lang_pred"),
        F.round(
            F.col("dot") / (F.col("nv") * F.lit(math.sqrt(PROFILE_NORM_SQ))), 6
        ).alias("lang_conf"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
            F.coalesce("lang_conf", F.lit(0.0)).alias("lang_conf"),
        )
    )
