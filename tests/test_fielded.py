"""Field-scoped query clauses (plans/multifield.search_fielded +
distributed twin + query.py routing): Lucene's `title:spark join`
shape — every positive clause must match IN ITS FIELD, scored by that
field's own BM25 statistics, `-field:term` suppresses, boosts
distribute per clause, conjunction across clauses. Ground truth: an
independent pandas ranker over the synthetic pages corpus; the local
engine, the distributed twin, and the CLI must agree with it and each
other."""

import math
import re
import subprocess
import sys
from collections import Counter

import pytest

from search_engine_spark import B, K1
from search_engine_spark.functions.text import extract_title
from search_engine_spark.operators.dedup import latest_snapshot
from search_engine_spark.operators.ids import assign_dense_ids
from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.multifield import (
    build_title_index,
    has_fielded_clause,
    known_fields,
    parse_fielded_query,
    search_fielded,
    search_fielded_distributed,
)

_TOK = re.compile(r"[^\W_]+", re.UNICODE)
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(spark):
    from search_engine_spark.sources.pages import generate_pages

    pages = latest_snapshot(generate_pages(spark, 500, partitions=4))
    return assign_dense_ids(pages, "url")


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_fld"))
    build_index(spark, corpus, d, n_buckets=4, segment_size=64,
                stem=False, html_col="html")
    build_title_index(spark, corpus, d, n_buckets=4, stem=False)
    return d


@pytest.fixture(scope="module")
def fields_pdf(corpus):
    pdf = corpus.select("doc_id", "html", "text").toPandas()
    body = {int(r.doc_id): _TOK.findall(r.text)
            for r in pdf.itertuples()}
    title = {int(r.doc_id): _TOK.findall(extract_title(r.html))
             for r in pdf.itertuples()}
    return {"body": body, "title": title}


def _stats(tfmap):
    tf = {d: Counter(ts) for d, ts in tfmap.items() if ts}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    n = len(tf)
    avgdl = sum(sum(c.values()) for c in tf.values()) / n
    return tf, df, n, avgdl


def _brute_fielded(fields_pdf, clauses, k=10):
    """clauses: [(field, term, neg, w)] — the parse_fielded_query
    output shape."""
    stats = {f: _stats(m) for f, m in fields_pdf.items()}

    def contrib(f, d, t):
        tf, df, n, avgdl = stats[f]
        c = tf.get(d)
        if not c or not c.get(t):
            return None
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        dl = sum(c.values())
        return idf * (c[t] * (K1 + 1.0)) / (
            c[t] + K1 * (1.0 - B + B * dl / avgdl))

    out = []
    for d in stats["body"][0]:
        s, ok = 0.0, True
        for f, t, neg, w in clauses:
            p = contrib(f, d, t)
            if neg:
                if p is not None:
                    ok = False
                    break
            else:
                if p is None:
                    ok = False
                    break
                s += w * p
        if ok:
            out.append((-s, d))
    out.sort()
    return [(d, -ns) for ns, d in out[:k]]


QUERIES = [
    "title:the spark",
    "spark title:data^2",
    "spark join -title:the",
    "body:spark title:data",
    "title:the title:data",
]


@pytest.mark.parametrize("qtext", QUERIES)
def test_local_matches_brute(index_dir, fields_pdf, qtext):
    clauses = parse_fielded_query(qtext, {"body", "title"}, stem=False)
    want = _brute_fielded(fields_pdf, clauses, k=10)
    got = search_fielded(index_dir, qtext, k=10, stem=False)
    assert [d for d, _ in got] == [d for d, _ in want], qtext
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


@pytest.mark.parametrize("qtext", QUERIES[:3])
def test_distributed_equals_local(spark, index_dir, qtext):
    got = [
        (r.doc_id, r.score)
        for r in search_fielded_distributed(
            spark, index_dir, qtext, k=10, stem=False
        ).collect()
    ]
    want = search_fielded(index_dir, qtext, k=10, stem=False)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)


def test_parse_and_routing_helpers(index_dir):
    kf = known_fields(index_dir)
    assert kf == {"body", "title"}
    assert has_fielded_clause("title:spark join", kf)
    assert not has_fielded_clause("spark join", kf)
    # unknown prefixes stay plain text for ROUTING...
    assert not has_fielded_clause("http://x.com spark", kf)
    # ...but inside the fielded grammar they are errors
    with pytest.raises(ValueError, match="unknown field"):
        parse_fielded_query("title:a zzz:b", kf, stem=False)
    with pytest.raises(ValueError, match="purely negative"):
        parse_fielded_query("-title:spark", kf, stem=False)
    with pytest.raises(ValueError, match="negative boost"):
        parse_fielded_query("title:a^-2 b", kf, stem=False)


def test_absent_clause_term_unsatisfiable(index_dir):
    assert search_fielded(index_dir, "title:zzqqabsent spark",
                          k=10, stem=False) == []


def test_restrict_composes(index_dir, fields_pdf):
    full = search_fielded(index_dir, "title:the spark", k=10 ** 6,
                          stem=False)
    allow = [d for d, _ in full if d % 2 == 0]
    got = search_fielded(index_dir, "title:the spark", k=10,
                         stem=False, restrict=allow)
    want = [h for h in full if h[0] in set(allow)][:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-12)


def test_cli_fielded(index_dir):
    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", index_dir,
         "--no-stem", "title:the spark", "-k", "10"],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    hits = [(int(ln.split("\t")[1]), float(ln.split("\t")[2]))
            for ln in lines[:-1]]
    want = search_fielded(index_dir, "title:the spark", k=10,
                          stem=False)
    assert [d for d, _ in hits] == [d for d, _ in want]
    # usage errors: unknown field, or-mode, quoted mix
    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", index_dir,
         "title:a zzz:b"],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 2 and "unknown field" in r.stderr
    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", index_dir,
         "--mode", "or", "title:the spark"],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 2
    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", index_dir,
         'title:the "spark join"'],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 2 and "orthogonal" in r.stderr
