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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from search_engine_spark.functions.text import (
    extract_text,
    extract_title,
    term_counts,
)

POSTINGS_SCHEMA = "doc_id long, term string, tf int, doclen int"


def postings_from_text(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    html_col: str | None = None,
    stem: bool = True,
    field: str = "body",
) -> DataFrame:
    """pages/documents -> flat postings (doc_id, term, tf, doclen).

    If ``html_col`` is given, rows with null ``text_col`` are extracted
    from raw HTML bytes (byte-identical extraction invariant,
    BASELINE.json input_hint). Empty docs are dropped (SURVEY.md P4).
    doclen is carried inline on every posting: this denormalization
    kills the doclen join (SURVEY.md J4) on the query hot path and
    rides into the compressed segments for join-free BM25 + WAND.

    field="title" tokenizes extract_title(html) instead of the body
    (requires html_col) — the per-field build for multi-field ranking
    (plans/multifield.py); doclen/df/stats then all describe the
    TITLE field, which is what per-field BM25 needs.
    """
    if field not in ("body", "title"):
        raise ValueError(f"field must be 'body' or 'title', got {field!r}")
    if field == "title" and not html_col:
        raise ValueError("field='title' needs html_col")
    if field == "title":
        cols = [F.col(id_col), F.col(html_col)]
    else:
        cols = [F.col(id_col), F.col(text_col)]
        if html_col:
            # html is the extraction FALLBACK (used only when text is
            # null) but it is the fattest column in the corpus — ship
            # it across Arrow only for the rows that need it. The
            # parquet scan still reads the column JVM-side; the IPC
            # transfer and the Python-side buffers drop it, which at
            # mostly-extracted corpora halves stage A's per-doc bytes.
            cols.append(
                F.when(F.col(text_col).isNull(), F.col(html_col))
                .alias(html_col)
            )
    narrow = df.select(*cols)  # column pruning BEFORE the opaque UDF

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        memo: dict[str, str] = {}  # partition-level: Porter amortizes
        for pdf in batches:
            texts = pdf[text_col] if field == "body" else None
            htmls = pdf[html_col] if html_col else None
            ids_in = pdf[id_col].to_numpy()
            doc_ids: list[int] = []
            n_terms: list[int] = []
            dls: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            for i in range(len(pdf)):
                if field == "title":
                    txt = extract_title(htmls.iat[i])
                else:
                    txt = texts.iat[i]
                    if (txt is None or txt != txt) and htmls is not None:
                        txt = extract_text(htmls.iat[i])
                dl, counts = term_counts(txt, stem=stem, memo=memo)
                if dl == 0:
                    continue
                doc_ids.append(int(ids_in[i]))
                n_terms.append(len(counts))
                dls.append(dl)
                terms.extend(counts.keys())
                tfs.extend(counts.values())
            # repeated columns built with np.repeat (C-level) instead of
            # per-doc list extends — the output is ~|distinct terms| per
            # doc rows, so construction cost matters as much as analysis
            reps = np.asarray(n_terms, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(np.asarray(doc_ids, np.int64), reps),
                    "term": pd.Series(terms, dtype="object"),
                    "tf": np.asarray(tfs, dtype=np.int32),
                    "doclen": np.repeat(np.asarray(dls, np.int32), reps),
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
