"""LM-Dirichlet similarity (scoring.lmd_exhaustive +
LocalSearcher.search_lmd + query.py --similarity lmd): the second
pluggable ranking function next to BM25, semantics pinned to

    score = Σ_matched [ln(1 + tf/(μ·p_t)) + ln(μ/(μ+dl))],
    p_t = cf_t / total_tokens,   μ = 2000

(Zhai & Lafferty 2001, rank-equivalent log form, no clipping).
Ground truth: an independent pandas ranker over the documents
fixture; the Spark plan, the local searcher, and the CLI must all
agree with it and with each other."""

import math
import os
import subprocess
import sys
from collections import Counter

import pytest

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.scoring import lmd_exhaustive
from search_engine_spark.plans.wand import LocalSearcher

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MU = 2000.0


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_lmd"))
    build_index(spark, documents, d, n_buckets=4, segment_size=64,
                stem=False)
    return d


@pytest.fixture(scope="module")
def ground(documents_pdf):
    """(per-doc term counts, per-doc length, per-term cf, total)."""
    tfs, dls = {}, {}
    cf = Counter()
    for doc_id, text in zip(documents_pdf.doc_id, documents_pdf.text):
        toks = [t for t in text.split() if t]
        if not toks:
            continue
        c = Counter(toks)
        tfs[int(doc_id)] = c
        dls[int(doc_id)] = len(toks)
        cf.update(c)
    total = float(sum(dls.values()))
    return tfs, dls, cf, total


def _brute_lmd(ground, qterms, mode="and", k=10, exclude=(),
               allow=None):
    tfs, dls, cf, total = ground
    uniq = list(dict.fromkeys(qterms))
    if mode == "and" and any(cf[t] == 0 for t in uniq):
        return []  # absent term makes AND unsatisfiable (engine rule)
    qterms = [t for t in uniq if cf[t] > 0]
    if not qterms:
        return []
    out = []
    for d, c in tfs.items():
        if allow is not None and d not in allow:
            continue
        if any(c[t] > 0 for t in exclude):
            continue
        matched = [t for t in qterms if c[t] > 0]
        if not matched:
            continue
        if mode == "and" and len(matched) != len(qterms):
            continue
        s = sum(
            math.log1p(c[t] / (MU * cf[t] / total))
            + math.log(MU / (MU + dls[d]))
            for t in matched
        )
        out.append((d, s))
    out.sort(key=lambda ds: (-ds[1], ds[0]))
    return out[:k]


CASES = [
    (["the"], "and"),
    (["spark", "join"], "and"),
    (["spark", "merge", "window"], "or"),
    (["data", "zzqq_absent"], "or"),  # absent term dropped under OR
]


@pytest.mark.parametrize("qterms,mode", CASES)
def test_local_matches_brute(ground, index_dir, qterms, mode):
    got = LocalSearcher(index_dir).search_lmd(
        qterms, k=10, stem=False, mode=mode
    )
    want = _brute_lmd(ground, qterms, mode=mode)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)


def test_absent_term_and_unsatisfiable(index_dir):
    assert LocalSearcher(index_dir).search_lmd(
        ["the", "zzqq_absent"], k=10, stem=False, mode="and"
    ) == []


def test_exclude_and_restrict(ground, index_dir, documents_pdf):
    s = LocalSearcher(index_dir)
    allow = [int(d) for d in documents_pdf.doc_id if d % 3 == 0]
    got = s.search_lmd(["the", "data"], k=10, stem=False, mode="or",
                       exclude=["spark"], restrict=allow)
    want = _brute_lmd(ground, ["the", "data"], mode="or",
                      exclude=["spark"], allow=set(allow))
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)
    # empty restrict set matches nothing
    assert s.search_lmd(["the"], k=5, stem=False, restrict=[]) == []


def test_spark_exhaustive_matches_brute(spark, ground, documents):
    from search_engine_spark.operators.aggregates import (
        postings_from_text,
    )

    postings = postings_from_text(documents, stem=False)
    got = [
        (r.doc_id, r.score)
        for r in lmd_exhaustive(
            spark, postings, ["spark", "merge", "window"],
            k=10, stem=False, mode="or",
        ).collect()
    ]
    want = _brute_lmd(ground, ["spark", "merge", "window"], mode="or")
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)


@pytest.mark.parametrize("qterms,mode", CASES[:3])
def test_distributed_equals_local(spark, index_dir, qterms, mode):
    from search_engine_spark.plans.index_query import IndexReader

    got = [
        (r.doc_id, r.score)
        for r in IndexReader(spark, index_dir).search_lmd(
            qterms, k=10, stem=False, mode=mode
        ).collect()
    ]
    want = LocalSearcher(index_dir).search_lmd(
        qterms, k=10, stem=False, mode=mode
    )
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)


def test_cli_lmd(index_dir, ground):
    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", index_dir,
         "--similarity", "lmd", "--no-stem", "spark join", "-k", "10"],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    hits = [(int(ln.split("\t")[1]), float(ln.split("\t")[2]))
            for ln in lines[:-1]]
    want = _brute_lmd(ground, ["spark", "join"], mode="and")
    assert [d for d, _ in hits] == [d for d, _ in want]
    # usage errors: grouped syntax / msm are BM25-only
    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", index_dir,
         "--similarity", "lmd", "--msm", "2", "--mode", "or", "spark"],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 2
    r = subprocess.run(
        [sys.executable, "query.py", "--index-dir", index_dir,
         "--similarity", "lmd", "spark|join"],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 2


def test_pruned_routes_and_is_bitidentical_to_exhaustive(index_dir):
    """Round-5 pruned LMD (derived impacts from the BM25 max_tfnorm
    inversion): must route on a tombstone-free index, and return
    BIT-identical (score-exact) results to the exhaustive reduction.
    The exhaustive twin is forced by planting a tombstone for an
    absent doc_id — masking is then a no-op but the route condition
    (live tombstones, no cf override) sends it down the old path."""
    import numpy as np

    pruned = LocalSearcher(index_dir)
    exhaustive = LocalSearcher(index_dir)
    exhaustive._deleted = np.array([10**15], dtype=np.int64)

    queries = CASES + [
        (["the", "of", "a"], "or"),
        (["the", "data"], "and"),
        (["window"], "or"),
    ]
    routed = False
    for qterms, mode in queries:
        pruned.last_segments_skipped = -1
        a = pruned.search_lmd(qterms, k=7, stem=False, mode=mode)
        if pruned.last_segments_skipped != -1:
            routed = True
        b = exhaustive.search_lmd(qterms, k=7, stem=False, mode=mode)
        assert a == b  # exact float equality, not approx
    assert routed, "pruned LMD path never routed on a clean index"


def test_pruned_respects_exclude_restrict_identically(index_dir,
                                                      documents_pdf):
    import numpy as np

    pruned = LocalSearcher(index_dir)
    exhaustive = LocalSearcher(index_dir)
    exhaustive._deleted = np.array([10**15], dtype=np.int64)
    allow = [int(d) for d in documents_pdf.doc_id if d % 2 == 0]
    for mode in ("and", "or"):
        a = pruned.search_lmd(["the", "data"], k=10, stem=False,
                              mode=mode, exclude=["spark"],
                              restrict=allow)
        b = exhaustive.search_lmd(["the", "data"], k=10, stem=False,
                                  mode=mode, exclude=["spark"],
                                  restrict=allow)
        assert a == b
