"""Phrase-query and n-gram-quality operators.

Phrase matching is the classic full-text feature beyond bag-of-words
BM25 (SURVEY.md §2.5 J3 covers only term-level AND). Two paths:

- Scan path (this module): per-doc sliding-window phrase counts as a
  pure JVM higher-order-function plan (transform/slice/aggregate —
  whole-stage codegen, no Python, no explode/self-join). Exact; used
  as the correctness oracle and for one-off analytical scans where
  the whole corpus is being read anyway.
- Index path (plans/build_index.py build_positions=True +
  plans/wand.py LocalSearcher.search_phrase): positional postings
  (delta-gap + varint position blobs per (term, doc)) so a serving
  query touches only the phrase terms' buckets, AND-intersects
  doc_ids, then adjacency-checks positions — never rescans text.
  Equivalence with the scan path is property-tested
  (tests/test_phrases.py).

Also here: Gopher-style duplicate-n-gram quality fractions (Rae et
al. 2021 "Scaling Language Models" repetition filters) — a training
-data quality signal computed with the same n-gram machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "tokens_col",
    "ngrams_col",
    "phrase_tf_col",
    "phrase_counts",
    "phrase_topk",
    "dup_ngram_stats",
]


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens of a clean (single-spaced) text column."""
    return F.split(F.col(text_col), " ")


def ngrams_col(toks: Column, n: int) -> Column:
    """All space-joined n-grams of a token array (empty array when the
    doc is shorter than n). Pure built-ins: sequence + transform +
    slice stay inside whole-stage codegen."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def phrase_tf_col(toks: Column, phrase: list[str]) -> Column:
    """Occurrences of the exact consecutive-token phrase in one doc
    (sliding window, overlaps counted — "a a a" contains "a a"
    twice). Array-equality compare per window position, summed with
    aggregate(); all JVM-side."""
    k = len(phrase)
    if k == 0:
        raise ValueError("empty phrase")
    target = F.array(*[F.lit(w) for w in phrase])
    window_hits = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.when(F.slice(toks, i + 1, k) == target, 1).otherwise(0),
    )
    return (
        F.when(
            F.size(toks) >= k,
            F.aggregate(window_hits, F.lit(0), lambda a, x: a + x),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )


def phrase_counts(
    df: DataFrame,
    phrase: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, phrase_tf) for every doc containing the phrase at
    least once. One narrow projection, no shuffle — the filter and
    the window count are codegen'd into the scan stage."""
    tf = phrase_tf_col(tokens_col(text_col), phrase)
    return (
        df.select(F.col(id_col).alias("doc_id"), tf.alias("phrase_tf"))
        .filter(F.col("phrase_tf") > 0)
    )


def phrase_topk(
    df: DataFrame,
    phrase: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by phrase frequency (tie-break doc_id asc) —
    TakeOrderedAndProject, no full sort."""
    return (
        phrase_counts(df, phrase, id_col=id_col, text_col=text_col)
        .orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("phrase_tf"), F.asc("doc_id")))
            .cast("long"),
        )
    )


def near_counts(
    df: DataFrame,
    term_a: str,
    term_b: str,
    slop: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scan-path proximity query: (doc_id, min_dist) for docs where
    the two terms co-occur within `slop` tokens. Distributed plan:
    posexplode -> filter to the two terms (pushed) -> per-doc
    self-join on position distance -> min — shuffles only the two
    terms' position rows, keyed by doc. The serving twin is
    plans/positions.py PhraseSearcher.near_counts (property-tested
    equal)."""
    toks = tokens_col(text_col)
    pos = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "term")
    ).filter(F.col("term").isin([term_a, term_b]))
    a = pos.filter(F.col("term") == term_a).select(
        "doc_id", F.col("pos").alias("pa")
    )
    b = pos.filter(F.col("term") == term_b).select(
        "doc_id", F.col("pos").alias("pb")
    )
    return (
        a.join(b, "doc_id")
        .filter(F.abs(F.col("pa") - F.col("pb")) <= slop)
        .groupBy("doc_id")
        .agg(F.min(F.abs(F.col("pa") - F.col("pb"))).cast("long")
             .alias("min_dist"))
    )


def dup_ngram_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc duplicate-n-gram fractions (n = 2, 3), the Gopher
    repetition-quality signals: frac = 1 - distinct/total. Docs
    shorter than 3 tokens are dropped (no trigram denominator).
    Entirely array built-ins — no explode, no shuffle."""
    toks = tokens_col(text_col)
    g2 = ngrams_col(toks, 2)
    g3 = ngrams_col(toks, 3)

    def frac(grams: Column) -> Column:
        return F.round(
            F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams), 6
        )

    return (
        df.filter(F.size(toks) >= 3)
        .select(
            F.col(id_col).alias("doc_id"),
            F.size(g2).cast("long").alias("n_bigrams"),
            frac(g2).alias("dup_bigram_frac"),
            F.size(g3).cast("long").alias("n_trigrams"),
            frac(g3).alias("dup_trigram_frac"),
        )
    )
