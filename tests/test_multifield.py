"""Multi-field (body + title) ranking: plans/multifield.

- the synthetic pages now carry real <title> content and the
  extract_text(html) == text invariant still holds (title text
  prepends the body — tests/test_pages.py re-checks it);
- extract_title pulls exactly the title;
- MultiFieldSearcher (body AND candidates, + w * title BM25 with the
  title field's own stats) equals an independent pandas ranker;
- title weight 0 reduces to plain body search scores.
"""

import math
import re
from collections import Counter

# local replica of the engine's token rule (\w minus underscore) —
# pages text carries an '&' marker that whitespace split would keep
_TOK = re.compile(r"[^\W_]+", re.UNICODE)

import pytest

from search_engine_spark.functions.text import extract_text, extract_title
from search_engine_spark.operators.dedup import latest_snapshot
from search_engine_spark.operators.ids import assign_dense_ids
from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.multifield import (
    MultiFieldSearcher,
    build_title_index,
)

from search_engine_spark import B, K1

W = 2.0


@pytest.fixture(scope="module")
def corpus(spark):
    from search_engine_spark.sources.pages import generate_pages

    pages = latest_snapshot(generate_pages(spark, 800, partitions=8))
    return assign_dense_ids(pages, "url")


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_mf"))
    build_index(spark, corpus, d, n_buckets=4, segment_size=64,
                stem=False, html_col="html")
    build_title_index(spark, corpus, d, n_buckets=4, stem=False)
    return d


@pytest.fixture(scope="module")
def corpus_pdf(corpus):
    return corpus.select("doc_id", "html", "text").toPandas()


def test_extract_title():
    assert extract_title(b"<html><head><title>A &amp; B</title></head>"
                         b"<body>x</body></html>") == "A & B"
    assert extract_title("<title>  spaced\tout </title>") == "spaced out"
    assert extract_title("<html><body>no title</body></html>") == ""
    assert extract_title(None) == ""
    # first title wins
    assert extract_title("<title>one</title><title>two</title>") == "one"


def test_generator_titles_present(corpus_pdf):
    titles = [extract_title(h) for h in corpus_pdf["html"]]
    nonempty = [t for t in titles if t]
    assert len(nonempty) > 0.9 * len(titles)  # only empty-body docs lack one
    # invariant: extracted text starts with the title
    for h, t, x in zip(corpus_pdf["html"], titles,
                       corpus_pdf["text"]):
        assert extract_text(h) == x
        assert x.startswith(t)


def _brute(corpus_pdf, qterms, k=30):
    body = {int(r.doc_id): _TOK.findall(r.text)
            for r in corpus_pdf.itertuples()}
    title = {int(r.doc_id): _TOK.findall(extract_title(r.html))
             for r in corpus_pdf.itertuples()}

    def field(tfmap):
        tf = {d: Counter(ts) for d, ts in tfmap.items() if ts}
        df = Counter()
        for c in tf.values():
            df.update(c.keys())
        n = len(tf)
        avgdl = sum(sum(c.values()) for c in tf.values()) / n
        return tf, df, n, avgdl

    btf, bdf, bn, bavg = field(body)
    ttf, tdf, tn, tavg = field(title)

    def bm25(c, df, n, avgdl, dl, t):
        if not c.get(t):
            return None
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        return idf * (c[t] * (K1 + 1.0)) / (
            c[t] + K1 * (1.0 - B + B * dl / avgdl))

    out = []
    for d, c in btf.items():
        parts = [bm25(c, bdf, bn, bavg, sum(c.values()), t)
                 for t in qterms]
        if any(p is None for p in parts):
            continue  # body AND drives candidates
        s = sum(parts)
        tc = Counter(title[d])
        for t in qterms:
            p = bm25(tc, tdf, tn, tavg, sum(tc.values()), t)
            if p is not None:
                s += W * p
        out.append((-s, d))
    out.sort()
    return [(d, -ns) for ns, d in out[:k]]


@pytest.mark.parametrize("qtext", ["the fast", "spark join", "window"])
def test_multifield_matches_bruteforce(index_dir, corpus_pdf, qtext):
    got = MultiFieldSearcher(index_dir, title_weight=W).search(
        qtext, k=30, stem=False
    )
    want = _brute(corpus_pdf, qtext.split(), k=30)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


@pytest.mark.parametrize("k", [1, 3])
def test_small_k_early_stop_is_exact(index_dir, corpus_pdf, k):
    """Tiny k exercises the iterative-deepening early-stop branch —
    results must still equal the exhaustive brute-force ranking."""
    got = MultiFieldSearcher(index_dir, title_weight=W).search(
        "the fast", k=k, stem=False
    )
    want = _brute(corpus_pdf, ["the", "fast"], k=k)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


def test_zero_weight_is_plain_body_search(index_dir):
    from search_engine_spark.plans.wand import LocalSearcher

    mf = MultiFieldSearcher(index_dir, title_weight=0.0)
    body = LocalSearcher(index_dir)
    got = mf.search("the fast", k=15, stem=False)
    want = body.search("the fast", k=15, stem=False)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-12)


def test_title_tombstone_fallback(spark, corpus, tmp_path):
    """delete_docs writes tombstones only under <index>/deletes; the
    title field index has no deletes dir of its own, so its searcher
    must fall back to the PARENT's tombstone table (fields share the
    doc_id space) — otherwise a standalone title search resurrects
    deleted docs (round-3 ADVICE)."""
    import os

    import pyarrow.parquet as pq

    from search_engine_spark.plans.deletes import delete_docs
    from search_engine_spark.plans.multifield import TITLE_DIR
    from search_engine_spark.plans.wand import LocalSearcher

    d = str(tmp_path / "idx_tomb")
    build_index(spark, corpus, d, n_buckets=4, segment_size=64,
                stem=False, html_col="html")
    build_title_index(spark, corpus, d, n_buckets=4, stem=False)
    tdir = os.path.join(d, TITLE_DIR)
    dic = pq.read_table(
        os.path.join(tdir, "dictionary"), columns=["term", "df"]
    ).to_pandas()
    term = dic[dic.df >= 2].sort_values("df").iloc[-1].term
    hits = LocalSearcher(tdir).search([term], k=5, stem=False)
    assert hits
    victim = hits[0][0]
    delete_docs(spark, d, [victim])
    assert not os.path.isdir(os.path.join(tdir, "deletes"))
    after = LocalSearcher(tdir).search([term], k=5, stem=False)
    assert victim not in [doc for doc, _ in after]
    # MultiFieldSearcher's body-driven path masks it too
    mf = MultiFieldSearcher(d, title_weight=W)
    got = mf.search([term], k=5, stem=False)
    assert victim not in [doc for doc, _ in got]


@pytest.mark.parametrize("qtext,mode,w", [
    ("the fast", "and", W),
    ("spark join", "and", W),
    ("the fast", "or", W),
    ("window", "or", 0.5),
    ("the fast", "and", 0.0),
    ("the fast", "and", -0.5),
])
def test_distributed_multifield_equals_local(spark, index_dir, qtext,
                                             mode, w):
    """Round-3 verdict #6: the cluster path must carry multi-field
    ranking like every other query feature. One Spark job ranks
    identically to MultiFieldSearcher (scores to 1e-9 — distributed
    float sums legitimately differ in accumulation order)."""
    from search_engine_spark.plans.multifield import (
        multifield_search_distributed,
    )

    k = 20
    got = [
        (r.doc_id, r.score)
        for r in multifield_search_distributed(
            spark, index_dir, qtext, k=k, title_weight=w, stem=False,
            mode=mode,
        ).collect()
    ]
    local = MultiFieldSearcher(index_dir, title_weight=w)
    want = local.search(qtext, k=k, stem=False, mode=mode)
    assert [d for d, _ in got] == [d for d, _ in want], (qtext, mode, w)
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


def test_distributed_multifield_not_and_offset(spark, index_dir):
    """NOT-terms and deep pagination on the distributed multi-field
    path: page 2 == the local ranking's slice [k:2k]."""
    from search_engine_spark.plans.multifield import (
        multifield_search_distributed,
    )

    k = 8
    local = MultiFieldSearcher(index_dir, title_weight=W)
    want = local.search("the fast", k=3 * k, stem=False,
                        exclude=["join"])
    got = [
        (r.doc_id, r.score)
        for r in multifield_search_distributed(
            spark, index_dir, "the fast", k=k, title_weight=W,
            stem=False, exclude=["join"], offset=k,
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want[k:2 * k]]
    for (_, a), (_, b) in zip(got, want[k:2 * k]):
        assert a == pytest.approx(b, abs=1e-9)


def _brute_bm25f(corpus_pdf, qterms, k=30, w_title=2.0, mode="or"):
    """Independent true-BM25F reference (Zaragoza TREC-13): per-field
    length-normalized tfs combine into ONE pseudo-tf before the k1
    saturation; idf over docs containing the term in ANY field,
    against the body index's n_docs (the serving convention)."""
    body = {int(r.doc_id): _TOK.findall(r.text)
            for r in corpus_pdf.itertuples()}
    title = {int(r.doc_id): _TOK.findall(extract_title(r.html))
             for r in corpus_pdf.itertuples()}

    def field(tfmap):
        tf = {d: Counter(ts) for d, ts in tfmap.items() if ts}
        n = len(tf)
        avgdl = sum(sum(c.values()) for c in tf.values()) / n
        return tf, n, avgdl

    btf, bn, bavg = field(body)
    ttf, tn, tavg = field(title)
    qterms = list(dict.fromkeys(qterms))

    def wtf(d, t):
        out = 0.0
        c = btf.get(d)
        if c and c[t]:
            dl = sum(c.values())
            out += 1.0 * c[t] / ((1.0 - B) + B * dl / bavg)
        tc = ttf.get(d)
        if tc and tc[t]:
            dl = sum(tc.values())
            out += w_title * tc[t] / ((1.0 - B) + B * dl / tavg)
        return out

    docs_any = sorted(set(btf) | set(ttf))
    df_any = {
        t: sum(1 for d in docs_any if wtf(d, t) > 0) for t in qterms
    }
    present = [t for t in qterms if df_any[t] > 0]
    if mode == "and" and len(present) < len(qterms):
        return []
    out = []
    for d in docs_any:
        s, matched = 0.0, 0
        for t in present:
            w = wtf(d, t)
            if w > 0:
                matched += 1
                idf = math.log(
                    1.0 + (bn - df_any[t] + 0.5) / (df_any[t] + 0.5)
                )
                s += idf * w / (K1 + w)
        if matched == 0 or (mode == "and" and matched < len(present)):
            continue
        out.append((-s, d))
    out.sort()
    return [(d, -ns) for ns, d in out[:k]]


@pytest.mark.parametrize("qtext,mode", [
    ("the fast", "or"), ("spark join", "and"), ("window", "or"),
    ("the spark data", "or"),
])
def test_bm25f_local_matches_bruteforce(index_dir, corpus_pdf, qtext,
                                        mode):
    from search_engine_spark.plans.multifield import search_bm25f

    got = search_bm25f(index_dir, qtext, k=30, stem=False, mode=mode,
                       field_weights={"title": W})
    want = _brute_bm25f(corpus_pdf, qtext.split(), k=30, w_title=W,
                        mode=mode)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


def test_bm25f_distributed_equals_local(spark, index_dir):
    from search_engine_spark.plans.multifield import (
        search_bm25f,
        search_bm25f_distributed,
    )

    for qtext, mode in (("the fast", "or"), ("spark join", "and")):
        want = search_bm25f(index_dir, qtext, k=15, stem=False,
                            mode=mode, field_weights={"title": W})
        got = [
            (r.doc_id, r.score)
            for r in search_bm25f_distributed(
                spark, index_dir, qtext, k=15, stem=False, mode=mode,
                field_weights={"title": W},
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9)


def test_bm25f_exclude_and_absent_terms(index_dir, corpus_pdf):
    from search_engine_spark.plans.multifield import search_bm25f

    # absent term: AND unsatisfiable, OR drops it
    assert search_bm25f(index_dir, "the zzqq_absent", k=5, stem=False,
                        mode="and", field_weights={"title": W}) == []
    got = search_bm25f(index_dir, "the zzqq_absent", k=10, stem=False,
                       mode="or", field_weights={"title": W})
    want = _brute_bm25f(corpus_pdf, ["the"], k=10, w_title=W)
    assert [d for d, _ in got] == [d for d, _ in want]
    # exclude suppresses docs containing the term in ANY field
    got_x = search_bm25f(index_dir, "the fast", k=30, stem=False,
                         mode="or", field_weights={"title": W},
                         exclude=["spark"])
    body = {int(r.doc_id) for r in corpus_pdf.itertuples()
            if "spark" in _TOK.findall(r.text)
            or "spark" in _TOK.findall(extract_title(r.html))}
    assert all(d not in body for d, _ in got_x)


def test_bm25f_cli(index_dir):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", index_dir,
         "--similarity", "bm25f", "--no-stem", "--mode", "or",
         "the fast", "-k", "5"],
        cwd=repo, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()[:-1]
    from search_engine_spark.plans.multifield import search_bm25f

    want = search_bm25f(index_dir, "the fast", k=5, stem=False,
                        mode="or", field_weights={"title": 2.0})
    assert [int(x.split("\t")[1]) for x in lines] == \
        [d for d, _ in want]
    # grouped syntax is a usage error in bm25f mode
    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", index_dir,
         "--similarity", "bm25f", "spark|join"],
        cwd=repo, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 2
