"""Stored fields + serving snippets (plans/docstore): row-group-pruned
text fetch, tombstone masking, deterministic query-biased snippets,
compaction consistency."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.deletes import compact_index, delete_docs
from search_engine_spark.plans.docstore import DocStore, build_docstore, snippet
from search_engine_spark.plans.wand import LocalSearcher


@pytest.fixture(scope="module")
def store_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_store"))
    build_index(spark, documents, d, n_buckets=8, segment_size=64,
                stem=False, salt_threshold=50, max_salts=4)
    build_docstore(spark, documents, d)
    return d


def test_get_texts_exact(store_dir, documents_pdf):
    ids = documents_pdf.doc_id.tolist()[::37]
    got = DocStore(store_dir).get_texts(ids)
    want = dict(
        zip(documents_pdf.doc_id, documents_pdf.text)
    )
    assert got == {i: want[i] for i in ids}
    assert DocStore(store_dir).get_texts([]) == {}
    assert DocStore(store_dir).get_texts([10**12]) == {}


def test_snippet_deterministic_window():
    text = "x x q1 x x x x q2 q1 x"
    got = snippet(text, ["q1", "q2"], stem=False, width=4)
    assert got == "… x [q2] [q1] x"
    # no match -> leading window with trailing ellipsis
    assert snippet("a b c d e f", ["zz"], stem=False, width=3) == "a b c …"
    assert snippet("", ["q"], stem=False) == ""
    assert snippet(None, ["q"], stem=False) == ""
    # earliest tie wins: both windows hold one distinct term
    assert snippet("q1 x x x x x x q1 x", ["q1"], stem=False,
                   width=3).startswith("[q1]")


def test_snippet_scores_the_displayed_window():
    """Round-3 ADVICE regression: coverage must be scored over the
    window actually shown (anchor shifted left by width//4), not over
    [p, p+width) — otherwise a match in the last quarter of the scored
    range is claimed but cut from the display."""
    toks = ["x"] * 45
    toks[10] = "alpha"
    toks[28] = "beta"
    toks[30] = "alpha"
    toks[35] = "beta"
    got = snippet(" ".join(toks), ["alpha", "beta"], stem=False, width=20)
    # the displayed window must genuinely contain both distinct terms
    assert "[alpha]" in got and "[beta]" in got


def test_snippet_stemmed_matching():
    # query analyzed with stemming matches inflected doc tokens
    from search_engine_spark.plans.scoring import analyze_query

    qterms = analyze_query("joining tables", stem=True)
    got = snippet("we were joining three tables quickly", qterms,
                  stem=True, width=8)
    assert "[joining]" in got and "[tables]" in got


def test_snippets_cover_query_terms_end_to_end(store_dir):
    s = LocalSearcher(store_dir)
    hits = s.search("spark join", k=5, stem=False)
    assert hits
    ds = DocStore(store_dir)
    texts = ds.get_texts([d for d, _ in hits])
    for d, _ in hits:
        sn = snippet(texts[d], ["spark", "join"], stem=False, width=30)
        assert "[spark]" in sn or "[join]" in sn
    # AND semantics: the widest window still brackets both somewhere in
    # the doc — check the chosen window maximizes distinct coverage for
    # at least the top hit with a generous width
    top = hits[0][0]
    sn = snippet(texts[top], ["spark", "join"], stem=False, width=60)
    assert "[spark]" in sn and "[join]" in sn


def test_docstore_masks_deleted_and_compacts(spark, documents,
                                             tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_store_del"))
    build_index(spark, documents, d, n_buckets=8, segment_size=64,
                stem=False, salt_threshold=50, max_salts=4)
    build_docstore(spark, documents, d)
    victim = int(documents.select(F.min("doc_id")).collect()[0][0])
    assert victim in DocStore(d).get_texts([victim])
    delete_docs(spark, d, [victim])
    assert DocStore(d).get_texts([victim]) == {}  # tombstone-masked
    compact_index(spark, d, segment_size=64, max_salts=4)
    assert DocStore(d).get_texts([victim]) == {}  # physically gone
    pdf = pd.read_parquet(os.path.join(d, "docstore"))
    assert victim not in set(pdf.doc_id)
    n_docs = documents.count()
    assert len(pdf) == n_docs - 1
