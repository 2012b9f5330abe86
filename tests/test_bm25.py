"""M1 end-to-end: BM25 exhaustive plan vs independent brute-force oracle
on sf0.001 documents (SURVEY.md 5.3, 7.3 minimum slice)."""

import pytest

from search_engine_spark.operators.aggregates import postings_from_text
from search_engine_spark.plans.scoring import analyze_query, bm25_exhaustive
from tests.oracle import brute_force_topk

# FIXTURES.md section 3 stand-in query set
QUERIES = [
    (1, "the", 10),
    (2, "window", 10),
    (3, "spark join", 10),
    (4, "fast hash merge", 10),
    (5, "zzzz", 10),
    (6, "spark zzzz", 10),
    (7, "join join", 10),
    (8, "Spark JOIN", 10),
    (9, "the fast", 25),
]


@pytest.fixture(scope="module")
def postings(spark, documents):
    p = postings_from_text(documents, stem=False).cache()
    p.count()
    yield p
    p.unpersist()


@pytest.fixture(scope="module")
def corpus(documents_pdf):
    return list(zip(documents_pdf.doc_id.tolist(), documents_pdf.text.tolist()))


@pytest.mark.parametrize("qid,qtext,k", QUERIES)
def test_rank_identity_vs_oracle(spark, postings, corpus, qid, qtext, k):
    got = bm25_exhaustive(spark, postings, qtext, k=k, stem=False).collect()
    qterms = analyze_query(qtext, stem=False)
    want = brute_force_topk(corpus, qterms, k=k)
    assert [r.doc_id for r in got] == [d for d, _ in want], f"qid={qid} doc order"
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-9), f"qid={qid} score"


def test_empty_query(spark, postings):
    assert bm25_exhaustive(spark, postings, "", k=10).count() == 0


def test_and_semantics(spark, postings, corpus):
    # every returned doc must contain ALL query terms
    got = bm25_exhaustive(spark, postings, "spark join", k=100, stem=False).collect()
    texts = dict(corpus)
    for r in got:
        toks = set(texts[r.doc_id].split())
        assert {"spark", "join"} <= toks
