"""Score explanation (LocalSearcher.explain_score, query.py
--explain-doc): the per-term breakdown must reconstruct the engine's
actual scores and agree with an independent pandas recount.
"""

import json
import math
import os
import subprocess
import sys

import pytest

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.wand import LocalSearcher

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_exp"))
    build_index(spark, documents, d, n_buckets=4, segment_size=64,
                stem=False, salt_threshold=100, max_salts=4)
    return d


@pytest.mark.parametrize("qtext", ["spark join", "the fast", "window"])
def test_explain_reconstructs_search_scores(index_dir, qtext):
    s = LocalSearcher(index_dir)
    hits = s.search(qtext, k=10, stem=False)
    assert hits
    for doc_id, score in hits:
        exp = s.explain_score(qtext, doc_id, stem=False)
        assert exp["matched_all"]
        assert exp["score"] == pytest.approx(score, abs=1e-12)
        assert exp["score"] == pytest.approx(
            sum(t["contribution"] for t in exp["terms"]), abs=0
        )
        for t in exp["terms"]:
            assert t["matched"]
            assert t["contribution"] == pytest.approx(
                t["idf"] * t["tfnorm"], abs=1e-15
            )


def test_explain_matches_pandas_recount(index_dir, documents_pdf):
    s = LocalSearcher(index_dir)
    doc_id, _ = s.search("spark join", k=1, stem=False)[0]
    exp = s.explain_score("spark join", doc_id, stem=False)
    toks = {int(r.doc_id): r.text.split()
            for r in documents_pdf.itertuples()}
    n = len(toks)
    for t in exp["terms"]:
        df = sum(1 for ts in toks.values() if t["term"] in ts)
        assert t["df"] == df
        assert t["tf"] == toks[doc_id].count(t["term"])
        assert t["doclen"] == len(toks[doc_id])
        assert t["idf"] == pytest.approx(
            math.log(1.0 + (n - df + 0.5) / (df + 0.5)), abs=1e-12
        )


def test_explain_unmatched_and_unknown(index_dir):
    s = LocalSearcher(index_dir)
    exp = s.explain_score("qqqzzz spark", 0, stem=False)
    assert not exp["matched_all"]
    unknown = next(t for t in exp["terms"] if t["term"] == "qqqzzz")
    assert unknown["df"] is None and not unknown["matched"]
    # absent doc: nothing matches, score 0
    exp = s.explain_score("spark", 10**9, stem=False)
    assert exp["score"] == 0.0 and not exp["matched_all"]


def test_cli_explain(index_dir):
    s = LocalSearcher(index_dir)
    doc_id, score = s.search("spark join", k=1, stem=False)[0]
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index-dir", index_dir, "--no-stem",
         "--explain-doc", str(doc_id), "spark join"],
        capture_output=True, text=True, env=env, check=True,
    )
    exp = json.loads(out.stdout)
    assert exp["doc_id"] == doc_id
    assert exp["score"] == pytest.approx(score, abs=1e-12)
