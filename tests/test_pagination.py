"""Deep pagination: LocalSearcher search_after cursor + IndexReader
offset paging + query.py --offset.

Contract under test:
- cursor property: walking pages of size p with after=(last score,
  last doc_id) reproduces the FULL ranking exactly, on every serving
  path (cold block-max AND/OR, warm vectorized AND/OR, pruned and
  unpruned) and with NOT-terms;
- an exhausted cursor returns [];
- cursor pagination never recomputes earlier pages into the result
  (no duplicates, no gaps);
- IndexReader offset paging: concatenated offset pages == the one-shot
  top-(offset+k) list;
- the CLI --offset prints absolute ranks and the correct slice.
"""

import os
import subprocess
import sys

import pytest

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.index_query import IndexReader
from search_engine_spark.plans.wand import LocalSearcher

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    ("the", "and"),
    ("the fast", "and"),
    ("spark join", "and"),
    ("the fast", "or"),
    ("spark join window", "or"),
]


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_pg"))
    build_index(spark, documents, d, n_buckets=4, segment_size=64,
                stem=False, salt_threshold=100, max_salts=4)
    return d


def _walk(searcher, qtext, mode, page, total, **kw):
    """Collect `total` results in pages of `page` via the cursor."""
    out, after = [], None
    while len(out) < total:
        hits = searcher.search(qtext, k=page, stem=False, mode=mode,
                               after=after, **kw)
        if not hits:
            break
        out.extend(hits)
        after = hits[-1]
    return out


@pytest.mark.parametrize("qtext,mode", QUERIES)
@pytest.mark.parametrize("page", [1, 3, 10])
def test_cursor_pages_reproduce_full_ranking(index_dir, qtext, mode, page):
    # k > corpus size: the COMPLETE ranking, so the cursor walk must
    # terminate by exhaustion at exactly the same length
    full = LocalSearcher(index_dir).search(
        qtext, k=600, stem=False, mode=mode, prune=False, fast=False
    )
    # cold block-max path (fresh searcher per walk)
    cold = _walk(LocalSearcher(index_dir), qtext, mode, page, len(full),
                 fast=False)
    assert cold == full
    # warm vectorized path: same searcher, terms promoted by repetition
    s = LocalSearcher(index_dir)
    for _ in range(3):
        s.search(qtext, k=5, stem=False, mode=mode)
    warm = _walk(s, qtext, mode, page, len(full))
    assert warm == full


def test_cursor_with_not_terms(index_dir):
    s = LocalSearcher(index_dir)
    full = s.search("the fast", k=400, stem=False, mode="and",
                    exclude=["join"], prune=False, fast=False)
    assert full  # fixture corpus must exercise the path
    paged = _walk(LocalSearcher(index_dir), "the fast", "and", 7,
                  len(full), exclude=["join"])
    assert paged == full


def test_cursor_exhausted_returns_empty(index_dir):
    s = LocalSearcher(index_dir)
    full = s.search("spark join", k=400, stem=False, prune=False,
                    fast=False)
    assert s.search("spark join", k=10, stem=False,
                    after=full[-1]) == []


def test_indexreader_offset_pages(spark, index_dir):
    r = IndexReader(spark, index_dir)
    one_shot = [(x.doc_id, x.score)
                for x in r.search("the fast", k=30, stem=False).collect()]
    paged = []
    for off in range(0, 30, 10):
        paged.extend(
            (x.doc_id, x.score)
            for x in r.search("the fast", k=10, stem=False,
                              offset=off).collect()
        )
    assert [d for d, _ in paged] == [d for d, _ in one_shot]
    for (_, a), (_, b) in zip(paged, one_shot):
        assert a == pytest.approx(b, abs=1e-9)
    with pytest.raises(ValueError):
        r.search("the", offset=-1)


def test_cli_offset(index_dir):
    env = dict(os.environ, PYTHONPATH=REPO)

    def run(*extra):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "query.py"),
             "--index-dir", index_dir, "--no-stem", "the fast", *extra],
            capture_output=True, text=True, env=env, check=True,
        )
        return [l.split("\t") for l in out.stdout.splitlines()
                if l and not l.startswith("{")]

    full = run("-k", "9")
    page3 = run("-k", "3", "--offset", "6")
    assert page3 == full[6:9]
    assert [r[0] for r in page3] == ["7", "8", "9"]  # absolute ranks
