"""Phrase-acceleration bigram table (plans/bigrams.py) — the nextword
index (Williams, Zobel & Bahle 2004).

The load-bearing invariant everywhere: an ACCELERATED PhraseSearcher
returns bit-identical results to the pure positional path, for every
phrase shape (covered 2-token, covered sub-pairs of longer phrases,
uncovered, covered-but-absent), across deletes, compaction, extends,
and merges. Hot-set choice can only change SPEED, never results.
"""

import json
import os
import random
import shutil

import numpy as np
import pandas as pd
import pytest

from search_engine_spark.plans.bigrams import (
    BigramReader,
    build_bigrams,
    hot_terms,
)
from search_engine_spark.plans.positions import PhraseSearcher, build_positions

VOCAB = ["spark", "hash", "join", "scan", "table", "merge", "sort", "row"]
HOT = ["spark", "hash"]


def _random_corpus(rng: random.Random, n_docs: int,
                   start: int = 0) -> pd.DataFrame:
    texts = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 40)))
        for _ in range(n_docs)
    ]
    return pd.DataFrame(
        {"doc_id": range(start, start + n_docs), "text": texts}
    )


def _plain(searcher: PhraseSearcher) -> PhraseSearcher:
    """The SAME searcher with the bigram table disabled — the pure
    positional twin every test compares against."""
    import copy

    twin = copy.copy(searcher)
    twin._bigrams_loaded = True
    twin._bigrams = None
    return twin


@pytest.fixture(scope="module")
def accel_idx(spark, tmp_path_factory):
    rng = random.Random(404)
    pdf = _random_corpus(rng, 150)
    d = os.path.join(str(tmp_path_factory.mktemp("bigrams")), "idx")
    df = spark.createDataFrame(pdf)
    build_positions(spark, df, d, n_buckets=4, stem=False)
    build_bigrams(spark, df, d, n_buckets=4, stem=False, hot=HOT)
    return d, pdf


def test_bigram_tf_equals_positional_adjacency(accel_idx):
    d, pdf = accel_idx
    s = PhraseSearcher(d)
    br = BigramReader(d)
    for a in VOCAB:
        for b in VOCAB:
            if not br.covers(a, b):
                continue
            docs, tfs = br.rows(a, b)
            got = dict(zip(docs.tolist(), tfs.tolist()))
            want = dict(_plain(s).phrase_counts([a, b]))
            assert got == want, (a, b)


def test_uncovered_pairs_not_indexed(accel_idx):
    d, _ = accel_idx
    br = BigramReader(d)
    assert not br.covers("join", "scan")
    docs, _ = br.rows("join", "scan")  # physically absent by design
    assert docs.size == 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_accel_equals_positional_all_shapes(accel_idx, seed):
    d, _ = accel_idx
    s = PhraseSearcher(d)
    plain = _plain(s)
    assert s._bigram_reader() is not None  # acceleration actually on
    rng = random.Random(seed)
    for _ in range(40):
        k = rng.randint(2, 4)
        phrase = [rng.choice(VOCAB) for _ in range(k)]
        for topk in (3, 10):
            assert s.search_phrase(phrase, k=topk) == plain.search_phrase(
                phrase, k=topk
            ), phrase


def test_covered_absent_phrase_is_empty(accel_idx):
    d, _ = accel_idx
    s = PhraseSearcher(d)
    # 'spark' is hot, so ('spark', missing-word) is covered; the
    # bigram row is absent -> direct [] without touching positions
    assert s.search_phrase(["spark", "qqqzzz"], k=5) == []
    assert s.search_phrase(["spark", "hash", "qqqzzz"], k=5) == []


def test_repeated_word_phrase(accel_idx):
    d, _ = accel_idx
    s = PhraseSearcher(d)
    assert s.search_phrase(["spark", "spark"], k=10) == _plain(
        s
    ).search_phrase(["spark", "spark"], k=10)


def test_direct_path_masks_tombstones(spark, accel_idx, tmp_path):
    from search_engine_spark.plans.deletes import delete_docs

    src, _ = accel_idx
    d = os.path.join(str(tmp_path), "idx_del")
    shutil.copytree(src, d)
    s0 = PhraseSearcher(d)
    top = s0.search_phrase(["spark", "hash"], k=3)
    assert top
    doomed = top[0][0]
    delete_docs(spark, d, [doomed])
    s = PhraseSearcher(d)
    got = s.search_phrase(["spark", "hash"], k=10)
    assert doomed not in [doc for doc, _ in got]
    assert got == _plain(s).search_phrase(["spark", "hash"], k=10)


def test_compact_filters_bigram_table(spark, tmp_path):
    """Full lifecycle over a complete index: delete -> compact drops
    the tombstoned doc's bigram rows, and the accelerated phrase path
    still equals the positional path on the survivors."""
    from search_engine_spark.plans.build_index import build_index
    from search_engine_spark.plans.deletes import compact_index, delete_docs

    rng = random.Random(11)
    pdf = _random_corpus(rng, 80)
    d = os.path.join(str(tmp_path), "idx_cmp")
    df = spark.createDataFrame(pdf)
    build_index(spark, df, d, n_buckets=4, segment_size=64, stem=False)
    build_positions(spark, df, d, n_buckets=4, stem=False)
    build_bigrams(spark, df, d, n_buckets=4, stem=False, hot=HOT)
    doomed = PhraseSearcher(d).search_phrase(["spark", "hash"], k=1)[0][0]
    delete_docs(spark, d, [doomed])
    compact_index(spark, d)
    rows = spark.read.parquet(os.path.join(d, "bigrams"))
    assert rows.filter(rows.doc_id == doomed).count() == 0
    s = PhraseSearcher(d)
    got = s.search_phrase(["spark", "hash"], k=50)
    assert doomed not in [doc for doc, _ in got]
    assert got == _plain(s).search_phrase(["spark", "hash"], k=50)


def test_append_extends_acceleration(spark, accel_idx, tmp_path):
    src, pdf_a = accel_idx
    d = os.path.join(str(tmp_path), "idx_ext")
    shutil.copytree(src, d)
    rng = random.Random(77)
    pdf_b = _random_corpus(rng, 60, start=1000)
    df_b = spark.createDataFrame(pdf_b)
    build_positions(spark, df_b, d, n_buckets=4, stem=False, mode="append")
    build_bigrams(spark, df_b, d, n_buckets=4, stem=False, mode="append")
    # the frozen hot list survives the append
    with open(os.path.join(d, "bigrams_meta.json")) as f:
        assert sorted(json.load(f)["hot"]) == sorted(HOT)
    s = PhraseSearcher(d)
    plain = _plain(s)
    for phrase in (["spark", "hash"], ["hash", "join"],
                   ["spark", "hash", "join"], ["table", "row"]):
        got = s.search_phrase(phrase, k=200)
        assert got == plain.search_phrase(phrase, k=200), phrase
        # new docs genuinely reachable through the accelerated path
        if phrase == ["spark", "hash"]:
            assert any(doc >= 1000 for doc, _ in got)


def test_append_meta_mismatch_rejected(spark, accel_idx, tmp_path):
    src, _ = accel_idx
    d = os.path.join(str(tmp_path), "idx_bad")
    shutil.copytree(src, d)
    df = spark.createDataFrame(_random_corpus(random.Random(5), 5, 2000))
    with pytest.raises(ValueError, match="physical invariants"):
        build_bigrams(spark, df, d, n_buckets=8, stem=False, mode="append")


def test_hot_terms_from_dictionary(spark, tmp_path):
    """hot_terms reads the built index's dictionary: top-B by df with
    a deterministic term tie-break."""
    from search_engine_spark.plans.build_index import build_index

    pdf = pd.DataFrame({
        "doc_id": range(6),
        "text": ["a b c", "a b", "a c", "a", "a b", "b c"],
    })
    d = os.path.join(str(tmp_path), "idx_hot")
    build_index(spark, spark.createDataFrame(pdf), d, n_buckets=2,
                stem=False)
    assert hot_terms(spark, d, 1) == ["a"]          # df 6
    assert hot_terms(spark, d, 2) == ["a", "b"]     # df 4
    assert hot_terms(spark, d, 3) == ["a", "b", "c"]


def _full_index(spark, tmp_path, name, pdf, hot=HOT):
    from search_engine_spark.plans.build_index import build_index

    d = os.path.join(str(tmp_path), name)
    df = spark.createDataFrame(pdf)
    build_index(spark, df, d, n_buckets=4, segment_size=64, stem=False)
    build_positions(spark, df, d, n_buckets=4, stem=False)
    build_bigrams(spark, df, d, n_buckets=4, stem=False, hot=hot)
    return d


def test_merge_into_carries_bigrams(spark, tmp_path):
    from search_engine_spark.plans.merge import merge_into

    rng = random.Random(21)
    a = _full_index(spark, tmp_path, "a", _random_corpus(rng, 70))
    b = _full_index(spark, tmp_path, "b", _random_corpus(rng, 50))
    summary = merge_into(spark, a, b)
    assert summary["bigrams_merged"]
    s = PhraseSearcher(a)
    plain = _plain(s)
    off = summary["doc_id_offset"]
    for phrase in (["spark", "hash"], ["hash", "join"],
                   ["spark", "hash", "table"]):
        got = s.search_phrase(phrase, k=300)
        assert got == plain.search_phrase(phrase, k=300), phrase
    # the incoming side's docs are served through the direct path
    got = s.search_phrase(["spark", "hash"], k=300)
    assert any(doc >= off for doc, _ in got)


def test_merge_refuses_hot_mismatch(spark, tmp_path):
    from search_engine_spark.plans.merge import merge_into

    rng = random.Random(22)
    a = _full_index(spark, tmp_path, "ha", _random_corpus(rng, 30))
    b = _full_index(spark, tmp_path, "hb", _random_corpus(rng, 30),
                    hot=["join"])
    with pytest.raises(ValueError, match="hot-term"):
        merge_into(spark, a, b)


def test_cli_build_flag_and_phrase_parity(spark, tmp_path):
    """build_index.py --bigrams + --extend auto-append: the CLI-built
    accelerated index answers --phrase identically to a plain
    positional build, before and after an extend."""
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(args):
        return subprocess.run([sys.executable] + args, cwd=REPO,
                              capture_output=True, text=True, timeout=420)

    def pages_pdf(n, start=0):
        rng = random.Random(start + 9)
        rows = []
        for i in range(start, start + n):
            body = " ".join(rng.choice(VOCAB) for _ in range(30))
            rows.append((
                f"https://ex.com/p{i}",
                pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i),
                f"<html><body>{body}</body></html>".encode(),
                None, "en",
            ))
        return pd.DataFrame(rows, columns=["url", "warc_ts", "html",
                                           "text", "lang"])

    p1 = os.path.join(str(tmp_path), "pages1")
    p2 = os.path.join(str(tmp_path), "pages2")
    spark.createDataFrame(pages_pdf(40)).write.parquet(p1)
    spark.createDataFrame(pages_pdf(60)).write.parquet(p2)  # 40 old + 20 new
    acc = os.path.join(str(tmp_path), "idx_acc")
    ref = os.path.join(str(tmp_path), "idx_ref")

    r = run(["build_index.py", "--input", p1, "--input-format", "pages",
             "--index-dir", acc, "--n-buckets", "4", "--positions",
             "--bigrams", "3"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["bigrams_built"]
    r = run(["build_index.py", "--input", p1, "--input-format", "pages",
             "--index-dir", ref, "--n-buckets", "4", "--positions"])
    assert r.returncode == 0, r.stderr[-2000:]

    def phrase(idx, q):
        r = run(["query.py", "--index-dir", idx, "--phrase", q, "-k", "10"])
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout.strip().splitlines()[:-1]

    for q in ("spark hash", "hash join", "spark hash table"):
        assert phrase(acc, q) == phrase(ref, q), q

    # --extend (no --bigrams flag needed): the table auto-extends
    for idx, extra in ((acc, []), (ref, [])):
        r = run(["build_index.py", "--input", p2, "--input-format",
                 "pages", "--index-dir", idx, "--n-buckets", "4",
                 "--positions", "--extend"] + extra)
        assert r.returncode == 0, r.stderr[-2000:]
    with open(os.path.join(acc, "bigrams_meta.json")) as f:
        meta = json.load(f)
    rows = spark.read.parquet(os.path.join(acc, "bigrams"))
    assert rows.agg({"doc_id": "max"}).collect()[0][0] >= 40
    for q in ("spark hash", "hash join"):
        assert phrase(acc, q) == phrase(ref, q), q

    # retrofit path: index_admin.py build-bigrams over the plain index
    r = run(["index_admin.py", "build-bigrams", "--index-dir", ref,
             "--input", p2, "--buckets", "4", "--top-terms", "3"])
    assert r.returncode == 0, r.stderr[-2000:]
    for q in ("spark hash", "spark hash table"):
        assert phrase(acc, q) == phrase(ref, q), q


def test_distributed_direct_path_parity(spark, accel_idx, tmp_path):
    """The cluster twin: phrase_search_distributed over an accelerated
    index (direct bigram scan, no Python stage) returns the same rows
    as the positional Spark plan AND the local searcher — before and
    after a delete."""
    from search_engine_spark.plans.deletes import delete_docs
    from search_engine_spark.plans.positions import (
        phrase_search_distributed,
    )

    src, _ = accel_idx
    d = os.path.join(str(tmp_path), "idx_dist")
    shutil.copytree(src, d)

    def dist(idx, phrase, k=20):
        return [
            (r.doc_id, r.phrase_tf)
            for r in phrase_search_distributed(spark, idx, phrase, k=k)
            .collect()
        ]

    # positional twin: same index with the bigram table hidden
    ref = os.path.join(str(tmp_path), "idx_ref")
    shutil.copytree(src, ref)
    os.remove(os.path.join(ref, "bigrams_meta.json"))
    shutil.rmtree(os.path.join(ref, "bigrams"))

    for phrase in (["spark", "hash"], ["hash", "join"], ["spark", "qqqzzz"]):
        got = dist(d, phrase)
        assert got == dist(ref, phrase), phrase
        local = PhraseSearcher(d).search_phrase(phrase, k=20)
        assert got == local, phrase

    top = dist(d, ["spark", "hash"], k=1)
    assert top
    delete_docs(spark, d, [top[0][0]])
    delete_docs(spark, ref, [top[0][0]])
    got = dist(d, ["spark", "hash"])
    assert top[0][0] not in [x for x, _ in got]
    assert got == dist(ref, ["spark", "hash"])


def test_distributed_direct_path_plan_is_pure_jvm(spark, accel_idx):
    """Plan gate: the covered-bigram distributed phrase plan must show
    NO Python evaluation (the whole point — a pruned posting scan),
    and must push the bigram term filter into the parquet scan."""
    from search_engine_spark.plans.positions import (
        phrase_search_distributed,
    )

    src, _ = accel_idx
    df = phrase_search_distributed(spark, src, ["spark", "hash"], k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan \
        and "FlatMapGroupsInPandas" not in plan, plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "spark hash" in optimized, optimized


def test_direct_path_restrict(accel_idx):
    """The bigram DIRECT path honors restrict= exactly like the
    positional path: allow-list applied before ranking, equal to the
    unrestricted run filtered post-hoc, and bit-equal between the
    accelerated and plain-positional searchers."""
    d, pdf = accel_idx
    s = PhraseSearcher(d)
    plain = _plain(s)
    phrase = [HOT[0], VOCAB[1]]  # covered pair -> direct path
    allow = sorted(int(x) for x in pdf.doc_id if x % 2 == 0)
    aset = set(allow)
    full = s.phrase_counts(phrase)
    want = [(doc, tf) for doc, tf in full if doc in aset]
    assert s.phrase_counts(phrase, restrict=allow) == want
    assert plain.phrase_counts(phrase, restrict=allow) == want
    want_top = sorted(want, key=lambda r: (-r[1], r[0]))[:5]
    assert s.search_phrase(phrase, k=5, restrict=allow) == want_top
    assert plain.search_phrase(phrase, k=5, restrict=allow) == want_top
    assert s.search_phrase(phrase, k=5, restrict=[]) == []
