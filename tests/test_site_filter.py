"""Filter-clause (restrict / site:) semantics: only allowed doc_ids
are eligible, survivor scores unchanged, on EVERY serving path —
cold block-max, warm vectorized, OR, msm, grouped, pagination — and
the distributed IndexReader twin. Ground truth: the independent
brute-force ranker filtered post-hoc (filtering commutes with ranking
because scores are query-only)."""

import pytest

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.index_query import IndexReader
from search_engine_spark.plans.wand import LocalSearcher
from tests.oracle import brute_force_topk


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_site"))
    build_index(spark, documents, d, n_buckets=8, segment_size=64,
                stem=False, salt_threshold=50, max_salts=4)
    return d


def _allowed(documents_pdf, mod, rem):
    return sorted(int(d) for d in documents_pdf.doc_id if d % mod == rem)


def _brute(documents_pdf, qterms, allow, mode="and", msm=1, k=10):
    full = brute_force_topk(
        list(zip(documents_pdf.doc_id, documents_pdf.text)),
        qterms, k=len(documents_pdf), mode=mode, msm=msm,
    )
    aset = set(allow)
    return [(d, s) for d, s in full if d in aset][:k]


CASES = [
    (["the"], "and", 1, 3, 0),
    (["spark", "join"], "and", 1, 3, 1),
    (["spark", "merge", "window"], "or", 1, 4, 2),
    (["spark", "merge", "window"], "or", 2, 4, 2),  # msm composes
    (["the", "data"], "and", 1, 50, 7),             # selective filter
]


@pytest.mark.parametrize("qterms,mode,msm,mod,rem", CASES)
def test_local_restrict_all_paths(documents_pdf, index_dir, qterms, mode,
                                  msm, mod, rem):
    allow = _allowed(documents_pdf, mod, rem)
    want = _brute(documents_pdf, qterms, allow, mode=mode, msm=msm)
    s = LocalSearcher(index_dir)
    for prune in (True, False):
        got = s.search(qterms, k=10, stem=False, mode=mode, msm=msm,
                       restrict=allow, prune=prune)
        assert [d for d, _ in got] == [d for d, _ in want], (qterms, prune)
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)
    # warm route (terms promoted on repeat) must agree bit-exactly
    # with its own cold run
    cold = s.search(qterms, k=10, stem=False, mode=mode, msm=msm,
                    restrict=allow, fast=False)
    warm = s.search(qterms, k=10, stem=False, mode=mode, msm=msm,
                    restrict=allow)
    assert warm == cold


def test_grouped_restrict(documents_pdf, index_dir):
    allow = _allowed(documents_pdf, 2, 0)
    s = LocalSearcher(index_dir)
    ref = s.search_grouped("spark|merge join", k=10, stem=False,
                           prune=False, restrict=allow)
    got = s.search_grouped("spark|merge join", k=10, stem=False,
                           restrict=allow)
    assert got == ref
    assert all(d % 2 == 0 for d, _ in got)
    # restricted results == unrestricted results filtered (scores equal)
    full = dict(s.search_grouped("spark|merge join", k=10 ** 6,
                                 stem=False))
    for d, sc in got:
        assert sc == pytest.approx(full[d], abs=1e-12)


def test_restrict_pagination(documents_pdf, index_dir):
    allow = _allowed(documents_pdf, 3, 0)
    s = LocalSearcher(index_dir)
    full = s.search(["the"], k=10 ** 6, stem=False, restrict=allow)
    pages, after = [], None
    while True:
        page = s.search(["the"], k=7, stem=False, restrict=allow,
                        after=after)
        if not page:
            break
        pages.extend(page)
        after = page[-1]
    assert pages == full


def test_restrict_empty_and_disjoint(index_dir):
    s = LocalSearcher(index_dir)
    assert s.search(["the"], k=10, stem=False, restrict=[]) == []
    # allowed ids that match nothing -> empty, not an error
    assert s.search(["the"], k=10, stem=False,
                    restrict=[10 ** 9]) == []


def test_reader_restrict_matches_local(spark, documents_pdf, index_dir):
    allow = _allowed(documents_pdf, 3, 1)
    s = LocalSearcher(index_dir)
    for qterms, mode in [(["spark", "join"], "and"),
                         (["spark", "merge"], "or")]:
        want = s.search(qterms, k=10, stem=False, mode=mode,
                        restrict=allow)
        got = [
            (r.doc_id, r.score)
            for r in IndexReader(spark, index_dir)
            .search(qterms, k=10, stem=False, mode=mode,
                    restrict=allow).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_reader_restrict_df(spark, documents_pdf, index_dir):
    """restrict as a DataFrame (the urlmap-filter shape query.py
    --site --distributed builds)."""
    allow = _allowed(documents_pdf, 4, 0)
    rdf = spark.createDataFrame([(d,) for d in allow], "doc_id long")
    got = [
        r.doc_id
        for r in IndexReader(spark, index_dir)
        .search(["the"], k=10, stem=False, restrict=rdf).collect()
    ]
    want = [d for d, _ in LocalSearcher(index_dir)
            .search(["the"], k=10, stem=False, restrict=allow)]
    assert got == want
