"""Spelling suggestions (plans/suggest): SymSpell symmetric-deletion
build + serving lookups.

Contract under test:
- build_suggest derives the variant table from the dictionary alone;
- Suggester.suggest ranks by (exact Damerau-Levenshtein asc, df desc,
  term asc) and an in-dictionary term suggests itself at distance 0;
- symmetric-deletion COVERAGE: every dictionary term within (restricted)
  Damerau-Levenshtein distance 1 of a probe is found — i.e. the
  deletion join loses nothing a brute-force vocabulary scan would find
  (checked against an independent brute-force ranker over the full
  dictionary parquet);
- the CLI (`index_admin.py build-suggest`, `query.py --suggest`)
  drives the same code paths end-to-end.
"""

import os
import subprocess
import sys

import pandas as pd
import pytest

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.suggest import (
    Suggester,
    build_suggest,
    damerau_levenshtein,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_sug"))
    build_index(spark, documents, d, n_buckets=4, segment_size=64,
                stem=False)
    build_suggest(spark, d)
    return d


def _brute(index_dir, probe, k=3, max_distance=2):
    """Independent ranker: scan the ENTIRE dictionary with the exact
    DP distance (no deletion-join shared code on the candidate side)."""
    dic = pd.read_parquet(os.path.join(index_dir, "dictionary"))
    scored = []
    for term, df in zip(dic["term"], dic["df"]):
        dist = damerau_levenshtein(probe, term, cap=max_distance)
        if dist <= max_distance:
            scored.append((dist, -int(df), term))
    scored.sort()
    return [(t, -ndf) for _, ndf, t in scored[:k]]


def test_exact_term_suggests_itself(index_dir):
    s = Suggester(index_dir)
    dic = pd.read_parquet(os.path.join(index_dir, "dictionary"))
    row = dic.sort_values("df", ascending=False).iloc[0]
    got = s.suggest(row["term"])
    assert got[0] == (row["term"], int(row["df"]))


def test_misspelling_distance1_matches_bruteforce(index_dir):
    """distance-1 probes: deletion join must equal the full-vocabulary
    brute-force scan exactly (symmetric 1-deletes cover ALL of
    distance 1: substitution, insertion, deletion, transposition)."""
    s = Suggester(index_dir)
    dic = pd.read_parquet(os.path.join(index_dir, "dictionary"))
    terms = sorted(dic["term"])[:40]
    probes = []
    for t in terms:
        if len(t) < 3:
            continue
        probes.append(t[1:])                     # deletion
        probes.append(t[0] + "@" + t[1:])        # insertion
        probes.append("@" + t[1:])               # substitution
        probes.append(t[1] + t[0] + t[2:])       # transposition
    assert probes
    for p in probes:
        got = s.suggest(p, k=3, max_distance=1)
        want = _brute(index_dir, p, k=3, max_distance=1)
        assert got == want, p


def test_no_false_positives(index_dir):
    """Every suggestion is a real dictionary term within max_distance."""
    s = Suggester(index_dir)
    vocab = set(pd.read_parquet(os.path.join(index_dir, "dictionary"))["term"])
    for probe in ("xyzzy", "wndow", "joni", "qq"):
        for term, df in s.suggest(probe, k=5, max_distance=2):
            assert term in vocab
            assert damerau_levenshtein(probe, term, cap=2) <= 2


def test_dp_distance_basics():
    assert damerau_levenshtein("abc", "abc") == 0
    assert damerau_levenshtein("abc", "abd") == 1      # substitution
    assert damerau_levenshtein("abc", "ab") == 1       # deletion
    assert damerau_levenshtein("abc", "abcd") == 1     # insertion
    assert damerau_levenshtein("abc", "acb") == 1      # transposition
    assert damerau_levenshtein("abcd", "cdab", cap=2) > 2   # capped out


def test_cli_complete(index_dir):
    """query.py --complete: top-k prefix completions by (df desc,
    term asc) — must equal a pandas recount over the dictionary."""
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index-dir", index_dir, "--complete", "s", "-k", "5"],
        capture_output=True, text=True, env=env, check=True,
    )
    got = [(p[1], int(p[2])) for p in
           (l.split("\t") for l in out.stdout.splitlines()
            if l and not l.startswith("{"))]
    dic = pd.read_parquet(os.path.join(index_dir, "dictionary"))
    want = (
        dic[dic.term.str.startswith("s")]
        .sort_values(["df", "term"], ascending=[False, True])
        .head(5)
    )
    assert got == list(zip(want.term, want.df.astype(int)))


def test_cli_end_to_end(spark, documents, tmp_path):
    """index_admin.py build-suggest + query.py --suggest drive the
    same build/serve paths; a misspelled query prints a correction."""
    d = str(tmp_path / "idx")
    build_index(spark, documents, d, n_buckets=4, segment_size=64,
                stem=False)
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "index_admin.py"),
         "build-suggest", "--index-dir", d],
        capture_output=True, text=True, env=env, check=True,
    )
    assert "suggest_rows" in out.stdout
    # pick a real term and misspell it (drop 2nd char)
    dic = pd.read_parquet(os.path.join(d, "dictionary"))
    term = max((t for t in dic["term"] if len(t) >= 5), key=len)
    probe = term[0] + term[2:]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index-dir", d, "--no-stem", "--suggest", probe],
        capture_output=True, text=True, env=env, check=True,
    )
    if probe not in set(dic["term"]):
        line = next(l for l in out.stdout.splitlines()
                    if f"did you mean: {probe} ->" in l)
        assert term in line.split("->", 1)[1].split()


def test_cli_autoretry_matches_clean_query(spark, documents, tmp_path):
    """A fully-misspelled --suggest query with zero hits retries with
    the corrections and must print the clean query's exact ranking."""
    d = str(tmp_path / "idx")
    build_index(spark, documents, d, n_buckets=4, segment_size=64,
                stem=False)
    build_suggest(spark, d)
    env = dict(os.environ, PYTHONPATH=REPO)

    def run(q):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "query.py"),
             "--index-dir", d, "--no-stem", "--suggest", q, "-k", "3"],
            capture_output=True, text=True, env=env, check=True,
        ).stdout.splitlines()

    clean = [l for l in run("spark join")
             if l and not l.startswith(("#", "{"))]
    dirty = run("sprak joni")
    assert any(l.startswith("# retried with corrections: spark join")
               for l in dirty)
    retried = [l for l in dirty if l and not l.startswith(("#", "{"))]
    assert retried == clean
