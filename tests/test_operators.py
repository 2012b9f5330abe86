"""Operator tests on Spark local vs pandas recomputation (SURVEY.md 5.2)."""

from collections import Counter

import pytest

from search_engine_spark.operators.aggregates import (
    collection_stats,
    doc_lengths,
    document_frequencies,
    postings_from_text,
    split_terms,
    term_frequencies,
)


@pytest.fixture(scope="module")
def pandas_truth(documents_pdf):
    """Whitespace-token ground truth computed with plain python."""
    tf = Counter()
    doclen = {}
    for _, row in documents_pdf.iterrows():
        toks = [t for t in row.text.split(" ") if t]
        doclen[row.doc_id] = len(toks)
        for t, c in Counter(toks).items():
            tf[(t, row.doc_id)] = c
    df = Counter()
    cf = Counter()
    for (t, _), c in tf.items():
        df[t] += 1
        cf[t] += c
    return {"tf": tf, "df": df, "cf": cf, "doclen": doclen}


def test_split_terms_tf(spark, documents, pandas_truth):
    got = {
        (r.term, r.doc_id): r.tf
        for r in term_frequencies(split_terms(documents)).collect()
    }
    assert got == dict(pandas_truth["tf"])


def test_document_frequencies(spark, documents, pandas_truth):
    tf = term_frequencies(split_terms(documents))
    got = {r.term: (r.df, r.cf) for r in document_frequencies(tf).collect()}
    want = {t: (pandas_truth["df"][t], pandas_truth["cf"][t]) for t in pandas_truth["df"]}
    assert got == want


def test_doc_lengths_and_stats(spark, documents, pandas_truth):
    tf = term_frequencies(split_terms(documents))
    got = {r.doc_id: r.doclen for r in doc_lengths(tf).collect()}
    assert got == pandas_truth["doclen"]
    stats = collection_stats(doc_lengths(tf)).collect()[0]
    n = len(pandas_truth["doclen"])
    assert stats.n_docs == n
    assert stats.avgdl == pytest.approx(sum(pandas_truth["doclen"].values()) / n)


def test_postings_from_text_matches_builtin_path(spark, documents, pandas_truth):
    """Engine UDF path (stem=False) == oracle built-in path on the
    synthetic corpus (lowercase space-separated words, so the analyzer
    and whitespace split agree)."""
    eng = postings_from_text(documents, stem=False)
    got = {(r.term, r.doc_id): (r.tf, r.doclen) for r in eng.collect()}
    want = {
        (t, d): (c, pandas_truth["doclen"][d])
        for (t, d), c in pandas_truth["tf"].items()
    }
    assert got == want


def test_postings_from_text_stemming(spark):
    df = spark.createDataFrame(
        [(1, "Joining queries quickly"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = postings_from_text(df, stem=True).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.term] = r.tf
    assert by_doc == {1: {"join": 1, "queri": 1, "quickli": 1}}
