"""Crawl-timestamp window filter (query.py --after-ts/--before-ts):
only docs whose urlmap warc_ts falls inside the inclusive window are
eligible, survivor scores unchanged — the freshness clause of a
Common-Crawl-style engine. The window resolves to the SAME restrict=
pre-filter the site: clause rides (removal-only on every path, so all
the block-max/pagination/msm properties of tests/test_site_filter.py
carry over); these tests pin the urlmap resolver, the local ≡
distributed twin, the site∧ts composition, the CLI wiring, and the
usage errors."""

import datetime as dt
import json
import os
import subprocess
import sys

import pytest

from query import _restrict_doc_ids, _restrict_docs_df
from search_engine_spark.operators.dedup import latest_snapshot
from search_engine_spark.operators.ids import assign_dense_ids
from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.wand import LocalSearcher

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# inclusive window bounds (the fixture's warc_ts spans 2026 day 0..365)
LO = dt.datetime(2026, 3, 1)
HI = dt.datetime(2026, 8, 31, 23, 59, 59)


@pytest.fixture(scope="module")
def corpus(spark):
    from search_engine_spark.sources.pages import generate_pages

    pages = latest_snapshot(generate_pages(spark, 400, partitions=4))
    return assign_dense_ids(pages, "url")


@pytest.fixture(scope="module")
def corpus_pdf(corpus):
    return corpus.select("doc_id", "url", "warc_ts", "text").toPandas()


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_ts"))
    build_index(spark, corpus, d, n_buckets=4, segment_size=64,
                stem=False)
    # the urlmap sink exactly as build_index.py's pages path writes it
    (
        corpus.select("doc_id", "url", "warc_ts")
        .sort("doc_id")
        .write.mode("overwrite")
        .parquet(os.path.join(d, "urlmap"))
    )
    return d


def _want_ids(corpus_pdf, lo=None, hi=None, host=None):
    m = corpus_pdf.doc_id == corpus_pdf.doc_id
    if lo is not None:
        m &= corpus_pdf.warc_ts >= lo
    if hi is not None:
        m &= corpus_pdf.warc_ts <= hi
    if host is not None:
        m &= corpus_pdf.url.str.split("/").str[2].str.lower() == host
    return sorted(int(d) for d in corpus_pdf.loc[m, "doc_id"])


def test_resolver_matches_pandas(corpus_pdf, index_dir):
    got = _restrict_doc_ids(index_dir, after_ts=LO, before_ts=HI)
    assert sorted(got) == _want_ids(corpus_pdf, LO, HI)
    # one-sided bounds
    assert sorted(_restrict_doc_ids(index_dir, after_ts=LO)) == \
        _want_ids(corpus_pdf, lo=LO)
    assert sorted(_restrict_doc_ids(index_dir, before_ts=HI)) == \
        _want_ids(corpus_pdf, hi=HI)
    # no filters -> None (callers pass restrict=None through)
    assert _restrict_doc_ids(index_dir) is None


def test_resolver_bounds_inclusive(corpus_pdf, index_dir):
    ts = corpus_pdf.warc_ts.iloc[7].to_pydatetime()
    got = set(_restrict_doc_ids(index_dir, after_ts=ts, before_ts=ts))
    want = set(_want_ids(corpus_pdf, ts, ts))
    assert got == want and want  # the boundary doc itself survives


def test_site_and_ts_compose(corpus_pdf, index_dir):
    host = "src3.example.com"
    got = _restrict_doc_ids(index_dir, host=host, after_ts=LO,
                            before_ts=HI)
    assert sorted(got) == _want_ids(corpus_pdf, LO, HI, host)
    both = set(_restrict_doc_ids(index_dir, host=host))
    ts_only = set(_restrict_doc_ids(index_dir, after_ts=LO,
                                    before_ts=HI))
    assert set(got) == both & ts_only


def test_distributed_twin_matches_local(spark, index_dir):
    for kw in (
        {"after_ts": LO, "before_ts": HI},
        {"after_ts": LO},
        {"host": "src5.example.com", "before_ts": HI},
    ):
        local = set(_restrict_doc_ids(index_dir, **kw))
        dist = {
            r.doc_id
            for r in _restrict_docs_df(spark, index_dir, **kw).collect()
        }
        assert dist == local, kw


def test_search_restricted_scores_unchanged(corpus_pdf, index_dir):
    allow = _restrict_doc_ids(index_dir, after_ts=LO, before_ts=HI)
    s = LocalSearcher(index_dir)
    got = s.search(["the", "data"], k=10, stem=False, restrict=allow)
    full = dict(s.search(["the", "data"], k=1 << 20, stem=False))
    aset = set(allow)
    want = [(d, sc) for d, sc in sorted(
        full.items(), key=lambda kv: (-kv[1], kv[0])
    ) if d in aset][:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-12)
    assert all(d in aset for d, _ in got)


def _run_cli(args):
    return subprocess.run([sys.executable] + args, cwd=REPO,
                          capture_output=True, text=True, timeout=420)


def test_cli_ts_window(corpus_pdf, index_dir):
    r = _run_cli(["query.py", "--index-dir", index_dir,
                  "--after-ts", LO.isoformat(),
                  "--before-ts", HI.isoformat(),
                  "the data", "-k", "10"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    summary = json.loads(lines[-1])
    hits = [(int(ln.split("\t")[1]), float(ln.split("\t")[2]))
            for ln in lines[:-1]]
    allow = _restrict_doc_ids(index_dir, after_ts=LO, before_ts=HI)
    want = LocalSearcher(index_dir).search(
        ["the", "data"], k=10, stem=False, restrict=allow
    )
    # CLI default is stemmed; 'the data' stems to itself under Porter
    assert [d for d, _ in hits] == [d for d, _ in want]
    assert summary["n"] == len(want)


def test_cli_usage_errors(index_dir, tmp_path):
    r = _run_cli(["query.py", "--index-dir", index_dir,
                  "--after-ts", "not-a-date", "the"])
    assert r.returncode == 2
    assert "ISO-8601" in r.stderr
    r = _run_cli(["query.py", "--index-dir", index_dir,
                  "--after-ts", "2026-09-01", "--before-ts", "2026-03-01",
                  "the"])
    assert r.returncode == 2
    assert "window is empty" in r.stderr
    # an index without a urlmap cannot serve the clause
    bare = str(tmp_path / "bare")
    os.makedirs(os.path.join(bare, "postings"))
    r = _run_cli(["query.py", "--index-dir", bare,
                  "--after-ts", "2026-03-01", "the"])
    assert r.returncode == 2
    assert "urlmap" in r.stderr
