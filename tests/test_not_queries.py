"""NOT-term (negation) queries: exhaustive plan, local WAND (all
paths), distributed reader, batch mode, CLI parsing — all must agree
on the semantics: docs containing ANY excluded term are suppressed
before top-k; surviving docs' scores are unchanged."""

import pytest

from query import split_not_terms
from search_engine_spark.operators.aggregates import postings_from_text
from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.index_query import IndexReader
from search_engine_spark.plans.scoring import bm25_exhaustive
from search_engine_spark.plans.wand import LocalSearcher

CASES = [
    ("spark join", ["filter"], "and"),
    ("spark join", ["filter"], "or"),
    ("the", ["spark"], "and"),
    ("the fast", ["merge", "batch"], "or"),
    ("window", ["window"], "and"),  # self-exclusion -> empty
    ("window", ["qqqzzz"], "and"),  # unknown NOT-term -> no-op
]


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_not"))
    build_index(spark, documents, d, n_buckets=8, segment_size=64,
                stem=False, salt_threshold=50, max_salts=4)
    return d


@pytest.fixture(scope="module")
def postings(spark, documents):
    p = postings_from_text(documents, stem=False).cache()
    p.count()
    yield p
    p.unpersist()


def _brute(corpus_pdf, qtext, excl, mode, k=10):
    """Independent ground truth: full-mode ranking minus excluded docs."""
    texts = dict(zip(corpus_pdf.doc_id, corpus_pdf.text))
    bad = {
        d for d, t in texts.items()
        if set(t.split()) & set(excl)
    }
    from tests.oracle import brute_force_topk

    full = brute_force_topk(
        list(texts.items()), qtext.split(), k=len(texts), mode=mode
    )
    return [(d, s) for d, s in full if d not in bad][:k]


@pytest.mark.parametrize("qtext,excl,mode", CASES)
def test_exhaustive_vs_brute(spark, postings, documents_pdf, qtext, excl,
                             mode):
    got = [
        (r.doc_id, r.score)
        for r in bm25_exhaustive(spark, postings, qtext, k=10, stem=False,
                                 mode=mode, exclude=excl).collect()
    ]
    want = _brute(documents_pdf, qtext, excl, mode)
    assert [d for d, _ in got] == [d for d, _ in want], (qtext, excl, mode)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


@pytest.mark.parametrize("qtext,excl,mode", CASES)
def test_local_matches_exhaustive(spark, postings, index_dir, qtext, excl,
                                  mode):
    want = [
        (r.doc_id, r.score)
        for r in bm25_exhaustive(spark, postings, qtext, k=10, stem=False,
                                 mode=mode, exclude=excl).collect()
    ]
    s = LocalSearcher(index_dir)
    for prune in (True, False):
        got = s.search(qtext, k=10, stem=False, mode=mode, exclude=excl,
                       prune=prune)
        assert [d for d, _ in got] == [d for d, _ in want], (qtext, prune)
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)
    # warm path (positive terms promoted by repetition) must agree too
    for _ in range(3):
        warm = s.search(qtext, k=10, stem=False, mode=mode, exclude=excl)
    assert [d for d, _ in warm] == [d for d, _ in want], (qtext, "warm")


@pytest.mark.parametrize("qtext,excl,mode", CASES[:4])
def test_distributed_matches_local(spark, index_dir, qtext, excl, mode):
    reader = IndexReader(spark, index_dir)
    got = [
        (r.doc_id, round(r.score, 9))
        for r in reader.search(qtext, k=10, stem=False, mode=mode,
                               exclude=excl).collect()
    ]
    want = [
        (d, round(s, 9))
        for d, s in LocalSearcher(index_dir).search(
            qtext, k=10, stem=False, mode=mode, exclude=excl
        )
    ]
    assert got == want


def test_batch_per_query_excludes(spark, index_dir):
    reader = IndexReader(spark, index_dir)
    queries = {"a": "spark join", "b": "spark join", "c": "the"}
    rows = reader.search_batch(
        queries, k=10, stem=False,
        excludes={"a": "filter", "c": "spark merge"},
    ).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append((r.doc_id, round(r.score, 9)))
    s = LocalSearcher(index_dir)
    assert got["a"] == [
        (d, round(sc, 9))
        for d, sc in s.search("spark join", k=10, stem=False,
                              exclude=["filter"])
    ]
    assert got["b"] == [
        (d, round(sc, 9))
        for d, sc in s.search("spark join", k=10, stem=False)
    ]
    assert got["c"] == [
        (d, round(sc, 9))
        for d, sc in s.search("the", k=10, stem=False,
                              exclude=["spark", "merge"])
    ]
    assert got["a"] != got["b"]  # the exclusion actually bit


def test_split_not_terms():
    assert split_not_terms("spark join -filter -slow") == (
        "spark join", "filter slow"
    )
    assert split_not_terms("plain query") == ("plain query", "")
    assert split_not_terms("-only") == ("", "only")
    assert split_not_terms("a - b") == ("a - b", "")  # bare dash stays


@pytest.mark.parametrize("seed", range(3))
def test_randomized_not_equivalence(spark, tmp_path_factory, seed):
    """Random corpus + random (query, NOT-set) pairs: every local path
    (pruned/unpruned/warm, AND/OR) == brute force minus excluded docs,
    exactly — including exclusion sets overlapping the query."""
    import numpy as np

    from tests.oracle import brute_force_topk

    rng = np.random.default_rng(1000 + seed)
    vocab = [f"w{i}" for i in range(30)]
    probs = np.arange(1, 31, dtype=float) ** -1.1
    probs /= probs.sum()
    docs = []
    for did in range(120):
        n = int(rng.integers(1, 60))
        docs.append((did, " ".join(rng.choice(vocab, p=probs, size=n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp(f"randnot{seed}"))
    build_index(spark, df, d, n_buckets=4, segment_size=16, stem=False,
                salt_threshold=20, max_salts=3)
    s = LocalSearcher(d)
    texts = dict(docs)
    for _ in range(12):
        qterms = list(rng.choice(vocab, size=int(rng.integers(1, 4)),
                                 replace=False))
        excl = list(rng.choice(vocab, size=int(rng.integers(1, 3)),
                               replace=False))
        k = int(rng.integers(1, 15))
        bad = {x for x, t in texts.items() if set(t.split()) & set(excl)}
        for mode in ("and", "or"):
            want = [
                (x, sc)
                for x, sc in brute_force_topk(docs, qterms, k=len(docs),
                                              mode=mode)
                if x not in bad
            ][:k]
            for prune in (True, False):
                got = s.search(qterms, k=k, stem=False, mode=mode,
                               exclude=excl, prune=prune)
                assert [x for x, _ in got] == [x for x, _ in want], (
                    qterms, excl, k, mode, prune)
                for (_, gs), (_, ws) in zip(got, want):
                    assert gs == pytest.approx(ws, abs=1e-9)
            # warm repeat (vectorized path) must stay identical
            assert s.search(qterms, k=k, stem=False, mode=mode,
                            exclude=excl) == got
