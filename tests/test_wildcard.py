"""Wildcard term matching: LocalSearcher.vocab_terms (contains /
regex dictionary scans), the Lucene-style bare-clause rewrite
(scoring.expand_wildcard -> OR-groups of df-ranked dictionary terms),
and the query.py wiring (--terms-matching scan mode + `ab*` clauses
in ranked queries). Ground truth: python re / substring over the full
dictionary read directly from parquet."""

import json
import os
import re
import subprocess
import sys

import pandas as pd
import pytest

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.scoring import (
    expand_wildcard,
    wildcard_to_regex,
)
from search_engine_spark.plans.wand import LocalSearcher

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_wc"))
    build_index(spark, documents, d, n_buckets=4, segment_size=64,
                stem=False)
    return d


@pytest.fixture(scope="module")
def vocab(index_dir):
    pdf = pd.read_parquet(os.path.join(index_dir, "dictionary"),
                          columns=["term", "df"])
    return dict(zip(pdf.term, pdf.df.astype(int)))


def test_vocab_terms_contains(index_dir, vocab):
    got = LocalSearcher(index_dir).vocab_terms(contains="ar",
                                               limit=10 ** 6)
    want = sorted(
        (t, df) for t, df in vocab.items() if "ar" in t
    )
    assert got == want and want


def test_vocab_terms_regex(index_dir, vocab):
    rx = "^s.*k$"
    got = LocalSearcher(index_dir).vocab_terms(regex=rx, limit=10 ** 6)
    pat = re.compile(rx)
    want = sorted((t, df) for t, df in vocab.items() if pat.search(t))
    assert got == want and want


def test_vocab_terms_by_df_order_and_cap(index_dir, vocab):
    s = LocalSearcher(index_dir)
    got = s.vocab_terms(contains="a", limit=5, by_df=True)
    all_sorted = sorted(
        ((t, df) for t, df in vocab.items() if "a" in t),
        key=lambda td: (-td[1], td[0]),
    )
    assert got == all_sorted[:5]


def test_vocab_terms_arg_validation(index_dir):
    s = LocalSearcher(index_dir)
    with pytest.raises(ValueError):
        s.vocab_terms()
    with pytest.raises(ValueError):
        s.vocab_terms(contains="a", regex="a")


def test_wildcard_to_regex():
    assert wildcard_to_regex("sp*k") == "^sp.*k$"
    assert wildcard_to_regex("*ark*") == "^.*ark.*$"
    assert wildcard_to_regex("a*b*c") == "^a.*b.*c$"
    with pytest.raises(ValueError):
        wildcard_to_regex("*")
    with pytest.raises(ValueError):
        wildcard_to_regex("**")


def test_expand_positive_equals_manual_group(index_dir, vocab):
    s = LocalSearcher(index_dir)
    out = expand_wildcard("s*k join", s)
    cands = [t for t, _ in s.vocab_terms(regex="^s.*k$", limit=16,
                                         by_df=True)]
    assert out == "|".join(cands) + " join"
    # the rewritten text ranks identically to the manual OR-group
    got = s.search_grouped(out, k=10, stem=False)
    want = s.search_grouped([cands, ["join"]], k=10, stem=False)
    assert got == want and got


def test_expand_semantics(index_dir, vocab):
    s = LocalSearcher(index_dir)
    # no-match positive keeps the star-stripped literal -> [] results
    out = expand_wildcard("zzqqx* join", s)
    assert out == "zzqqx join"
    assert s.search(out, k=10, stem=False) == []
    # no-match negative vanishes
    assert expand_wildcard("join -zzqqx*", s) == "join "
    # boost distributes over the variants
    out = expand_wildcard("s*k^2", s)
    assert all(alt.endswith("^2") for alt in out.split("|"))
    # negation expands to NOT-terms and actually excludes
    out = expand_wildcard("the -s*k", s)
    neg = {t[1:] for t in out.split()[1:]}
    assert neg == set(
        t for t, _ in s.vocab_terms(regex="^s.*k$", limit=16,
                                    by_df=True)
    )
    hits = s.search_grouped(
        out.split()[0], k=10 ** 6, stem=False, exclude=list(neg)
    )
    manual = s.search("the", k=10 ** 6, stem=False, exclude=list(neg))
    assert hits == manual


def _run_cli(args):
    return subprocess.run([sys.executable] + args, cwd=REPO,
                          capture_output=True, text=True, timeout=420)


def test_cli_terms_matching(index_dir, vocab):
    r = _run_cli(["query.py", "--index-dir", index_dir,
                  "--terms-matching", "s*k", "-k", "5"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    got = [(ln.split("\t")[1], int(ln.split("\t")[2]))
           for ln in lines[:-1]]
    want = LocalSearcher(index_dir).vocab_terms(
        regex="^s.*k$", limit=5, by_df=True
    )
    assert got == want
    assert json.loads(lines[-1])["n"] == len(want)
    # standalone mode: query text alongside is a usage error
    r = _run_cli(["query.py", "--index-dir", index_dir,
                  "--terms-matching", "s*k", "the"])
    assert r.returncode == 2
    # match-all pattern is a usage error, not a vocabulary dump
    r = _run_cli(["query.py", "--index-dir", index_dir,
                  "--terms-matching", "*"])
    assert r.returncode == 2
    assert "every term" in r.stderr


def test_cli_wildcard_clause(index_dir):
    s = LocalSearcher(index_dir)
    r = _run_cli(["query.py", "--index-dir", index_dir, "--no-stem",
                  "s*k join", "-k", "10"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    hits = [(int(ln.split("\t")[1]), float(ln.split("\t")[2]))
            for ln in lines[:-1]]
    want = s.search_grouped(
        expand_wildcard("s*k join", s), k=10, stem=False
    )
    assert [d for d, _ in hits] == [d for d, _ in want]
    for (_, a), (_, b) in zip(hits, want):
        assert a == pytest.approx(b, abs=1e-6)
    # unsupported shape (star inside an OR-group literal) is a usage
    # error — never a silently star-stripped query
    r = _run_cli(["query.py", "--index-dir", index_dir, "--no-stem",
                  "s*k|join data"])
    assert r.returncode == 2
    assert "wildcard" in r.stderr
