"""Inbound anchor-text field (operators/graph.extract_anchor_texts +
plans/multifield.build_anchor_index) — the third classic web-ranking
field next to body and title.

- extraction equals an independent pandas re-implementation (regex
  findall + urlmap dict + per-target (src_url, slot) order) on the
  synthetic corpus;
- the fixture's anchor-agreement property holds: every inbound anchor
  for a target repeats the same target-keyed 2-word phrase;
- max_anchors_per_doc caps the per-target concatenation;
- three-field MultiFieldSearcher (body + title + anchor) equals an
  exhaustive pandas ranker, and the distributed twin equals the local
  searcher bit-for-bit;
- anchor weight 0 / missing anchor terms reduce to the two-field path.
"""

import math
import re
from collections import Counter

import pytest

from search_engine_spark import B, K1
from search_engine_spark.functions.text import extract_title
from search_engine_spark.operators.dedup import latest_snapshot
from search_engine_spark.operators.graph import ANCHOR_RE, extract_anchor_texts
from search_engine_spark.operators.ids import assign_dense_ids
from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.multifield import (
    MultiFieldSearcher,
    build_anchor_index,
    build_title_index,
    multifield_search_distributed,
)

_TOK = re.compile(r"[^\W_]+", re.UNICODE)
_A = re.compile(ANCHOR_RE)

WEIGHTS = {"title": 2.0, "anchor": 3.0}


@pytest.fixture(scope="module")
def corpus(spark):
    from search_engine_spark.sources.pages import generate_pages

    pages = latest_snapshot(generate_pages(spark, 600, partitions=8))
    return assign_dense_ids(pages, "url")


@pytest.fixture(scope="module")
def corpus_pdf(corpus):
    return corpus.select("doc_id", "url", "html", "text").toPandas()


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_anchor"))
    build_index(spark, corpus, d, n_buckets=4, segment_size=64,
                stem=False, html_col="html")
    build_title_index(spark, corpus, d, n_buckets=4, stem=False)
    # urlmap passed inline (the plan also reads <index>/urlmap when
    # built via the CLI — test_cli_anchor covers that path)
    build_anchor_index(spark, corpus, d, n_buckets=4, segment_size=64,
                       stem=False, urlmap=corpus.select("url", "doc_id"))
    return d


def _anchor_oracle(corpus_pdf, *, cap=1024):
    """Independent pandas re-implementation of extract_anchor_texts."""
    url_to_id = dict(zip(corpus_pdf["url"], corpus_pdf["doc_id"]))
    per_target: dict[int, list[tuple[str, int, str]]] = {}
    for r in corpus_pdf.itertuples():
        for slot, (href, anchor) in enumerate(
            _A.findall(r.html.decode("utf-8"))
        ):
            anchor = anchor.strip()
            if not anchor or href not in url_to_id:
                continue
            d = int(url_to_id[href])
            per_target.setdefault(d, []).append((r.url, slot, anchor))
    out = {}
    for d, rows in per_target.items():
        rows.sort()
        out[d] = " ".join(a for _, _, a in rows[:cap])
    return out


@pytest.fixture(scope="module")
def anchor_texts(corpus_pdf):
    return _anchor_oracle(corpus_pdf)


def test_extract_matches_pandas_oracle(corpus, corpus_pdf, anchor_texts):
    got = {
        int(r.doc_id): r.text
        for r in extract_anchor_texts(
            corpus, corpus.select("url", "doc_id")
        ).collect()
    }
    assert got == anchor_texts
    assert len(got) > 0.5 * len(corpus_pdf)  # the graph fixture is dense


def test_anchor_agreement_property(anchor_texts):
    """Fixture invariant: all inbound anchors of a target are the SAME
    2-word phrase — the concatenation is that phrase repeated."""
    multi = 0
    for text in anchor_texts.values():
        words = text.split()
        assert len(words) % 2 == 0
        first = tuple(words[:2])
        assert all(
            tuple(words[i:i + 2]) == first for i in range(0, len(words), 2)
        )
        if len(words) > 2:
            multi += 1
    assert multi > 0  # some targets have >1 in-link


def test_cap_limits_anchors(corpus, corpus_pdf):
    capped = {
        int(r.doc_id): r.text
        for r in extract_anchor_texts(
            corpus, corpus.select("url", "doc_id"), max_anchors_per_doc=1
        ).collect()
    }
    want = _anchor_oracle(corpus_pdf, cap=1)
    assert capped == want
    assert all(len(t.split()) == 2 for t in capped.values())


def _brute3(corpus_pdf, anchor_texts, qterms, weights, k=30):
    body = {int(r.doc_id): _TOK.findall(r.text)
            for r in corpus_pdf.itertuples()}
    fields = {
        "title": {int(r.doc_id): _TOK.findall(extract_title(r.html))
                  for r in corpus_pdf.itertuples()},
        "anchor": {d: _TOK.findall(t) for d, t in anchor_texts.items()},
    }

    def stats(tfmap):
        tf = {d: Counter(ts) for d, ts in tfmap.items() if ts}
        df = Counter()
        for c in tf.values():
            df.update(c.keys())
        n = len(tf)
        avgdl = sum(sum(c.values()) for c in tf.values()) / n
        return tf, df, n, avgdl

    def bm25(c, df, n, avgdl, t):
        if not c.get(t):
            return None
        dl = sum(c.values())
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        return idf * (c[t] * (K1 + 1.0)) / (
            c[t] + K1 * (1.0 - B + B * dl / avgdl))

    btf, bdf, bn, bavg = stats(body)
    fstats = {name: stats(m) for name, m in fields.items()}
    out = []
    for d, c in btf.items():
        parts = [bm25(c, bdf, bn, bavg, t) for t in qterms]
        if any(p is None for p in parts):
            continue  # body AND drives candidates
        s = sum(parts)
        for name, w in weights.items():
            ftf, fdf, fn, favg = fstats[name]
            fc = ftf.get(d, Counter())
            for t in qterms:
                p = bm25(fc, fdf, fn, favg, t)
                if p is not None:
                    s += w * p
        out.append((-s, d))
    out.sort()
    return [(d, -ns) for ns, d in out[:k]]


@pytest.mark.parametrize("qtext", ["the fast", "spark join", "of"])
def test_three_field_matches_bruteforce(index_dir, corpus_pdf,
                                        anchor_texts, qtext):
    got = MultiFieldSearcher(index_dir, field_weights=WEIGHTS).search(
        qtext, k=30, stem=False
    )
    want = _brute3(corpus_pdf, anchor_texts, qtext.split(), WEIGHTS, k=30)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


@pytest.mark.parametrize("k", [1, 3])
def test_three_field_small_k_early_stop(index_dir, corpus_pdf,
                                        anchor_texts, k):
    got = MultiFieldSearcher(index_dir, field_weights=WEIGHTS).search(
        "the data", k=k, stem=False
    )
    want = _brute3(corpus_pdf, anchor_texts, ["the", "data"], WEIGHTS, k=k)
    assert [d for d, _ in got] == [d for d, _ in want]


@pytest.mark.parametrize("qtext,mode", [("the fast", "and"),
                                        ("spark join", "or")])
def test_distributed_equals_local_three_field(spark, index_dir, qtext,
                                              mode):
    local = MultiFieldSearcher(index_dir, field_weights=WEIGHTS).search(
        qtext, k=20, stem=False, mode=mode
    )
    dist = multifield_search_distributed(
        spark, index_dir, qtext, k=20, stem=False, mode=mode,
        field_weights=WEIGHTS,
    ).collect()
    assert [(r.doc_id, r.score) for r in dist] == [
        (d, pytest.approx(s, abs=1e-9)) for d, s in local
    ]


def test_zero_anchor_weight_is_two_field(index_dir):
    two = MultiFieldSearcher(index_dir, title_weight=2.0).search(
        "the fast", k=15, stem=False
    )
    three = MultiFieldSearcher(
        index_dir, field_weights={"title": 2.0, "anchor": 0.0}
    ).search("the fast", k=15, stem=False)
    assert two == three


def test_missing_field_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="build-anchor"):
        MultiFieldSearcher(str(tmp_path), field_weights={"anchor": 1.0})


def test_cli_build_anchor_and_query(spark, tmp_path):
    """End-to-end CLI path: build_index.py (pages, writes urlmap) ->
    index_admin.py build-anchor -> query.py --anchor-weight; the CLI
    result equals the in-process MultiFieldSearcher over the same
    index, and fsck accepts the anchor field index."""
    import json as _json
    import os as _os
    import subprocess
    import sys

    import pandas as pd

    REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

    def run(args):
        return subprocess.run([sys.executable] + args, cwd=REPO,
                              capture_output=True, text=True, timeout=420)

    rows = []
    for i in range(30):
        body = f"spark data doc{i} " + "join " * (i % 3 + 1)
        # pages link to the NEXT page with a shared anchor phrase and
        # to page 0 with a celebrity anchor
        links = (
            f'<a href="https://ex.com/p{(i + 1) % 30}">fast engine</a> '
            f'<a href="https://ex.com/p0">landing page</a>'
        )
        rows.append((
            f"https://ex.com/p{i}",
            pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i),
            f"<html><body>{body} {links}</body></html>".encode(),
            None,  # force html extraction
            "en",
        ))
    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    pages = _os.path.join(str(tmp_path), "pages")
    spark.createDataFrame(pdf).write.parquet(pages)
    idx = _os.path.join(str(tmp_path), "idx")

    r = run(["build_index.py", "--input", pages, "--input-format",
             "pages", "--index-dir", idx, "--n-buckets", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    r = run(["index_admin.py", "build-anchor", "--index-dir", idx,
             "--pages", pages, "--buckets", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    summary = _json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["field"] == "anchor"
    assert _os.path.isdir(_os.path.join(idx, "fields", "anchor"))

    r = run(["query.py", "--index-dir", idx, "--anchor-weight", "3.0",
             "landing", "-k", "5"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    hits = [(int(ln.split("\t")[1]), float(ln.split("\t")[2]))
            for ln in lines[:-1]]
    want = MultiFieldSearcher(
        idx, field_weights={"anchor": 3.0}
    ).search("landing", k=5)
    assert [d for d, _ in hits] == [d for d, _ in want]
    for (_, a), (_, b) in zip(hits, want):
        assert a == pytest.approx(b, abs=1e-6)
    # 'landing' appears ONLY in anchor text; body-AND drives
    # candidates, so a pure anchor term returns nothing by itself
    assert hits == [] or all(s > 0 for _, s in hits)

    # every page's body mentions 'landing page'-free text, but p0 has
    # 29 inbound 'landing page' anchors: querying a body term present
    # everywhere, doc 0 must outrank when anchor weight is on
    r0 = run(["query.py", "--index-dir", idx, "spark", "-k", "1"])
    ra = run(["query.py", "--index-dir", idx, "--anchor-weight", "5.0",
              "landing spark", "-k", "1", "--mode", "or"])
    assert r0.returncode == 0 and ra.returncode == 0
    top_anchor = int(ra.stdout.strip().splitlines()[0].split("\t")[1])
    um = pd.read_parquet(_os.path.join(idx, "urlmap"))
    assert dict(zip(um.doc_id, um.url))[top_anchor] == "https://ex.com/p0"

    # the anchor field is an ordinary index: fsck passes on it
    r = run(["index_admin.py", "fsck", "--index-dir",
             _os.path.join(idx, "fields", "anchor")])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
