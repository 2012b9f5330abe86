"""Core IR aggregates over DataFrames (SURVEY.md A1-A5, T1-T6).

Two tokenization paths exist on purpose:

- ``postings_from_text`` — the ENGINE path: one fused Arrow-batched
  mapInPandas pass (extract -> tokenize -> stem -> per-doc tf count).
  Counting tf inside the UDF is a map-side combine: the shuffle that
  follows carries (term, doc_id, tf) rows, never raw tokens — at
  10^12-doc scale this is the difference between shuffling ~1 posting
  per (doc, distinct term) and ~1 row per token occurrence.
- ``split_terms`` — the ORACLE path: pure built-in
  ``F.split``/``F.explode`` (whole-stage codegen, JVM-side), used by
  the driver-checked queries so Spark and DuckDB compute the same
  whitespace tokenization with zero Python in the loop.

All downstream aggregates (tf, df, cf, doclen, stats) are plain
two-phase hash aggregations — Catalyst's partial+final HashAggregate
absorbs most term skew before the exchange (SURVEY.md section 4).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from search_engine_spark.functions.text import analyze, extract_text

POSTINGS_SCHEMA = "doc_id long, term string, tf int, doclen int"


def postings_from_text(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    html_col: str | None = None,
    stem: bool = True,
) -> DataFrame:
    """pages/documents -> flat postings (doc_id, term, tf, doclen).

    If ``html_col`` is given, rows with null ``text_col`` are extracted
    from raw HTML bytes (byte-identical extraction invariant,
    BASELINE.json input_hint). Empty docs are dropped (SURVEY.md P4).
    doclen is carried inline on every posting: this denormalization
    kills the doclen join (SURVEY.md J4) on the query hot path and
    rides into the compressed segments for join-free BM25 + WAND.
    """
    cols = [id_col, text_col] + ([html_col] if html_col else [])
    narrow = df.select(*cols)  # column pruning BEFORE the opaque UDF

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict[str, str] = {}
            out_ids: list[int] = []
            out_terms: list[str] = []
            out_tfs: list[int] = []
            out_dls: list[int] = []
            texts = pdf[text_col]
            htmls = pdf[html_col] if html_col else None
            for i in range(len(pdf)):
                txt = texts.iat[i]
                if (txt is None or txt != txt) and htmls is not None:
                    txt = extract_text(htmls.iat[i])
                toks = analyze(txt, stem=stem, memo=memo)
                dl = len(toks)
                if dl == 0:
                    continue
                did = int(pdf[id_col].iat[i])
                counts = Counter(toks)
                out_ids.extend([did] * len(counts))
                out_terms.extend(counts.keys())
                out_tfs.extend(counts.values())
                out_dls.extend([dl] * len(counts))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "term": pd.Series(out_terms, dtype="object"),
                    "tf": pd.Series(out_tfs, dtype="int32"),
                    "doclen": pd.Series(out_dls, dtype="int32"),
                }
            )

    return narrow.mapInPandas(gen, POSTINGS_SCHEMA)


def split_terms(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Oracle-path tokenization: whitespace split, JVM-side built-ins
    only (matches DuckDB ``string_split(text, ' ')`` exactly)."""
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .filter(F.col("term") != "")
    )


def term_frequencies(terms: DataFrame) -> DataFrame:
    """A1: tf per (term, doc_id) from exploded terms."""
    return terms.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )


def document_frequencies(tf: DataFrame) -> DataFrame:
    """A2/A3: exact df + cf per term over (term, doc_id, tf) rows.

    Exact by construction — each (term, doc) pair appears once, so
    count(*) == count(distinct doc). approx_count_distinct is rejected:
    rank identity demands exact df (SURVEY.md A2).
    """
    return tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def doc_lengths(tf: DataFrame) -> DataFrame:
    """A4: doclen per doc (sum of tfs)."""
    return tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("doclen"))


def collection_stats(doclen: DataFrame) -> DataFrame:
    """A5: one-row (n_docs, avgdl) — broadcastable constants."""
    return doclen.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
