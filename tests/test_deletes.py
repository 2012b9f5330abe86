"""Deletion lifecycle: tombstones, query-time filtering, compaction
(plans/deletes; SURVEY.md §2 lifecycle verbs build/resume/extend +
delete/compact).

Contract under test (the Lucene-style semantics documented in
plans/deletes.py):
- after delete_docs, NO path surfaces a deleted doc (LocalSearcher
  AND/OR, warm and cold, pruned and unpruned; IndexReader one-shot and
  batch; PhraseSearcher and its distributed twin) and the top-k
  REFILLS with the next-best live docs;
- surviving docs' scores are UNCHANGED by a logical delete (df /
  n_docs / avgdl keep build-time values until compaction);
- compact_index converges to exactly the index a fresh build over the
  surviving corpus produces (dictionary, stats, decoded postings,
  query results — value-identical);
- tombstones survive extend_index (the flat still carries deleted
  docs' postings until compaction; masking stays on).
"""

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.build_index import build_index, extend_index
from search_engine_spark.plans.deletes import (
    compact_index,
    delete_docs,
    load_tombstones,
)
from search_engine_spark.plans.index_query import IndexReader
from search_engine_spark.plans.wand import LocalSearcher

QUERIES = [
    ("the", 10),
    ("window", 10),
    ("spark join", 10),
    ("fast hash merge", 10),
    ("the fast", 25),
]


@pytest.fixture()
def index_dir(spark, documents, tmp_path_factory):
    # function-scoped: every test mutates its own index copy
    d = str(tmp_path_factory.mktemp("index_del"))
    build_index(
        spark, documents, d, n_buckets=8, segment_size=64, stem=False,
        salt_threshold=50, max_salts=4,
    )
    return d


def _full_minus(searcher_full, qtext, deleted, k, mode="and"):
    """Expected post-delete results: the FULL index's ranking with
    deleted docs dropped, cut to k — scores must be unchanged."""
    full = searcher_full.search(qtext, k=k + len(deleted), stem=False,
                                mode=mode)
    return [(d, s) for d, s in full if d not in deleted][:k]


def _delete_set(index_dir):
    """Doc ids that actually appear in the top ranks, so the refill
    path is genuinely exercised."""
    s = LocalSearcher(index_dir)
    hits = s.search("the", k=5, stem=False) + s.search(
        "spark join", k=5, stem=False
    )
    return sorted({d for d, _ in hits})


def test_local_searcher_masks_deleted(spark, index_dir):
    deleted = _delete_set(index_dir)
    full = LocalSearcher(index_dir)
    expected = {
        (q, m): _full_minus(full, q, set(deleted), k, mode=m)
        for q, k in QUERIES
        for m in ("and", "or")
    }
    delete_docs(spark, index_dir, deleted)
    s = LocalSearcher(index_dir)
    for (q, m), want in expected.items():
        for prune in (True, False):
            got = s.search(q, k=dict(QUERIES)[q], stem=False, mode=m,
                           prune=prune)
            assert got == want, (q, m, prune)
        # warm path: repeat until promotion kicks in, must stay equal
        for _ in range(3):
            got = s.search(q, k=dict(QUERIES)[q], stem=False, mode=m)
        assert got == want, (q, m, "warm")
        assert not any(d in set(deleted) for d, _ in got)


def test_refresh_deletes_on_live_searcher(spark, index_dir):
    s = LocalSearcher(index_dir)
    before = s.search("the", k=10, stem=False)
    victim = before[0][0]
    delete_docs(spark, index_dir, [victim])
    # stale caches: the live searcher still serves the old view
    assert s.search("the", k=10, stem=False) == before
    s.refresh_deletes()
    got = s.search("the", k=10, stem=False)
    assert victim not in {d for d, _ in got}
    assert got == [(d, sc) for d, sc in
                   LocalSearcher(index_dir).search("the", k=10, stem=False)]


def test_index_reader_masks_deleted(spark, index_dir):
    deleted = _delete_set(index_dir)
    full = LocalSearcher(index_dir)
    delete_docs(spark, index_dir, deleted)
    reader = IndexReader(spark, index_dir)
    for q, k in QUERIES:
        for m in ("and", "or"):
            want = _full_minus(full, q, set(deleted), k, mode=m)
            got = [(r.doc_id, r.score)
                   for r in reader.search(q, k=k, stem=False, mode=m).collect()]
            assert [d for d, _ in got] == [d for d, _ in want], (q, m)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert gs == pytest.approx(ws, abs=1e-9)
    # batch path
    batch = reader.search_batch(
        {f"q{i}": q for i, (q, _) in enumerate(QUERIES)}, k=10, stem=False
    ).collect()
    dset = set(deleted)
    assert all(r.doc_id not in dset for r in batch)


def test_compact_equals_fresh_build(spark, documents, index_dir,
                                    tmp_path_factory):
    deleted = _delete_set(index_dir)
    delete_docs(spark, index_dir, deleted)
    out = compact_index(spark, index_dir, segment_size=64, max_salts=4)
    assert out["tombstones_applied"] == len(deleted)
    assert load_tombstones(index_dir).size == 0  # tombstones cleared

    fresh_dir = str(tmp_path_factory.mktemp("index_fresh"))
    survivors = documents.filter(~F.col("doc_id").isin(deleted))
    build_index(
        spark, survivors, fresh_dir, n_buckets=8, segment_size=64,
        stem=False, salt_threshold=50, max_salts=4,
    )

    def dict_rows(d):
        return {
            (r.term, r.df, r.cf, r.bucket)
            for r in spark.read.parquet(os.path.join(d, "dictionary"))
            .select("term", "df", "cf", "bucket").collect()
        }

    assert dict_rows(index_dir) == dict_rows(fresh_dir)
    ra, rb = IndexReader(spark, index_dir), IndexReader(spark, fresh_dir)
    assert (ra.n_docs, ra.avgdl) == (rb.n_docs, rb.avgdl)
    sa, sb = LocalSearcher(index_dir), LocalSearcher(fresh_dir)
    for q, k in QUERIES:
        for m in ("and", "or"):
            assert sa.search(q, k=k, stem=False, mode=m) == sb.search(
                q, k=k, stem=False, mode=m
            ), (q, m)


def test_compact_propagates_to_title_index(spark, tmp_path_factory):
    """Round-3 parity fix: fields/title is an ordinary index over the
    same doc_id space, so compaction must rewrite it too — postings,
    df, n_docs, avgdl. Before the fix the title index kept dead docs'
    postings and build-time stats, diverging from a fresh two-index
    build over the survivors."""
    from search_engine_spark.operators.dedup import latest_snapshot
    from search_engine_spark.operators.ids import assign_dense_ids
    from search_engine_spark.plans.multifield import (
        MultiFieldSearcher,
        build_title_index,
    )
    from search_engine_spark.sources.pages import generate_pages

    corpus = assign_dense_ids(
        latest_snapshot(generate_pages(spark, 400, partitions=4)), "url"
    )
    idx = str(tmp_path_factory.mktemp("index_mft"))
    build_index(spark, corpus, idx, n_buckets=4, segment_size=64,
                stem=False, html_col="html")
    build_title_index(spark, corpus, idx, n_buckets=4, stem=False)

    victims = [d for d, _ in MultiFieldSearcher(idx, title_weight=2.0)
               .search("spark join", k=5, stem=False)][:3]
    assert victims
    delete_docs(spark, idx, victims)
    compact_index(spark, idx, segment_size=64)

    fresh = str(tmp_path_factory.mktemp("index_mft_fresh"))
    survivors = corpus.filter(~F.col("doc_id").isin(victims))
    build_index(spark, survivors, fresh, n_buckets=4, segment_size=64,
                stem=False, html_col="html")
    build_title_index(spark, survivors, fresh, n_buckets=4, stem=False)

    def title_dict_rows(d):
        p = os.path.join(d, "fields", "title", "dictionary")
        return {
            (r.term, r.df, r.cf)
            for r in spark.read.parquet(p).select("term", "df", "cf")
            .collect()
        }

    assert title_dict_rows(idx) == title_dict_rows(fresh)
    ta = LocalSearcher(os.path.join(idx, "fields", "title"))
    tb = LocalSearcher(os.path.join(fresh, "fields", "title"))
    assert (ta.n_docs, ta.avgdl) == (tb.n_docs, tb.avgdl)
    for q in ("spark join", "the data", "hot"):
        got = MultiFieldSearcher(idx, title_weight=2.0).search(
            q, k=10, stem=False
        )
        want = MultiFieldSearcher(fresh, title_weight=2.0).search(
            q, k=10, stem=False
        )
        assert got == want, q


def test_compact_without_tombstones_is_noop(spark, index_dir):
    before = LocalSearcher(index_dir).search("the", k=10, stem=False)
    out = compact_index(spark, index_dir)
    assert out["tombstones_applied"] == 0
    assert LocalSearcher(index_dir).search("the", k=10, stem=False) == before


def test_delete_nonexistent_ids_harmless(spark, index_dir):
    before = LocalSearcher(index_dir).search("the", k=10, stem=False)
    delete_docs(spark, index_dir, [10**12, 10**12 + 1])
    assert LocalSearcher(index_dir).search("the", k=10, stem=False) == before
    compact_index(spark, index_dir, segment_size=64, max_salts=4)
    after = LocalSearcher(index_dir).search("the", k=10, stem=False)
    assert [d for d, _ in after] == [d for d, _ in before]


def test_tombstones_survive_extend(spark, documents, index_dir):
    deleted = _delete_set(index_dir)
    delete_docs(spark, index_dir, deleted)
    max_id = documents.agg(F.max("doc_id")).collect()[0][0]
    extra = documents.limit(20).withColumn(
        "doc_id", F.col("doc_id") + F.lit(int(max_id) + 1)
    )
    extend_index(spark, extra, index_dir, segment_size=64, stem=False,
                 max_salts=4)
    s = LocalSearcher(index_dir)
    got = s.search("the", k=30, stem=False)
    dset = set(deleted)
    assert got and all(d not in dset for d, _ in got)


def test_phrase_paths_mask_deleted(spark, documents, index_dir):
    from search_engine_spark.plans.positions import (
        PhraseSearcher,
        build_positions,
        phrase_search_distributed,
    )

    build_positions(spark, documents, index_dir, n_buckets=4, stem=False)
    ps = PhraseSearcher(index_dir)
    full = ps.search_phrase("the", k=10)
    assert full
    victim = full[0][0]
    delete_docs(spark, index_dir, [victim])
    ps2 = PhraseSearcher(index_dir)
    got = ps2.search_phrase("the", k=10)
    assert victim not in {d for d, _ in got}
    want = [(d, n) for d, n in ps.search_phrase("the", k=11)
            if d != victim][:10]
    assert got == want
    dist = phrase_search_distributed(spark, index_dir, "the", k=10).collect()
    assert [(r.doc_id, r.phrase_tf) for r in dist] == got
    # compaction keeps the positional table consistent
    compact_index(spark, index_dir, segment_size=64, max_salts=4)
    ps3 = PhraseSearcher(index_dir)
    assert ps3.search_phrase("the", k=10) == got


def test_index_reader_oversized_tombstones_anti_join(spark, index_dir,
                                                     monkeypatch):
    """Closure-oversized tombstone sets must route the left_anti-join
    branch and produce identical results to the closure mask."""
    import search_engine_spark.plans.deletes as deletes_mod
    import search_engine_spark.plans.index_query as iq_mod

    deleted = _delete_set(index_dir)
    full = LocalSearcher(index_dir)
    delete_docs(spark, index_dir, deleted)

    r_small = IndexReader(spark, index_dir)
    assert r_small._deleted_in_closure
    monkeypatch.setattr(deletes_mod, "IN_CLOSURE_MAX", 0)
    monkeypatch.setattr(iq_mod, "IN_CLOSURE_MAX", 0, raising=False)
    r_big = IndexReader(spark, index_dir)
    assert not r_big._deleted_in_closure
    for q, k in QUERIES[:3]:
        want = _full_minus(full, q, set(deleted), k)
        got = [(r.doc_id, r.score)
               for r in r_big.search(q, k=k, stem=False).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], q
        small = [(r.doc_id, r.score)
                 for r in r_small.search(q, k=k, stem=False).collect()]
        assert got == small, q


def test_exchange_dirs_atomic_swap(tmp_path):
    """renameat2(RENAME_EXCHANGE) path: contents of the two dirs are
    exchanged and both paths exist at all times."""
    from search_engine_spark.plans.deletes import _exchange_dirs

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir(); b.mkdir()
    (a / "x.txt").write_text("from-a")
    (b / "y.txt").write_text("from-b")
    ok = _exchange_dirs(str(a), str(b))
    assert ok, "RENAME_EXCHANGE should be available on this kernel"
    assert (a / "y.txt").read_text() == "from-b"
    assert (b / "x.txt").read_text() == "from-a"
    assert not (a / "x.txt").exists() and not (b / "y.txt").exists()


def test_swap_rewrite_publishes_new_and_cleans_tmp(tmp_path):
    from search_engine_spark.plans.deletes import _swap_rewrite

    live = tmp_path / "table"
    live.mkdir()
    (live / "old.parquet").write_text("old")
    # a leftover temp from a crashed prior attempt must not break it
    stale = tmp_path / "table.compact"
    stale.mkdir()
    (stale / "junk").write_text("junk")

    def write_fn(tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "new.parquet"), "w") as f:
            f.write("new")

    _swap_rewrite(str(live), write_fn)
    assert (live / "new.parquet").read_text() == "new"
    assert not (live / "old.parquet").exists()
    assert not stale.exists()


def test_concurrent_reader_survives_compaction(spark, documents,
                                               tmp_path_factory):
    """The atomic-publish property end to end: a reader that re-OPENS
    the index in a loop while compact_index rewrites every table must
    never hit a missing/half-written directory. (Mixed-generation
    RESULTS during the window are acceptable; exceptions are not.)"""
    import threading

    from search_engine_spark.plans.build_index import build_index
    from search_engine_spark.plans.wand import LocalSearcher

    d = str(tmp_path_factory.mktemp("live_idx"))
    build_index(spark, documents, d, n_buckets=4, segment_size=64,
                stem=False, salt_threshold=50, max_salts=4)

    errors: list = []
    stop = threading.Event()

    def reader_loop():
        while not stop.is_set():
            try:
                s = LocalSearcher(d)  # fresh open — stresses the paths
                s.search("spark join", k=5, stem=False)
                s.search("the", k=5, stem=False, mode="or")
            except Exception as e:  # noqa: BLE001 — the assertion IS "no exception"
                errors.append(repr(e))
                return

    t = threading.Thread(target=reader_loop, daemon=True)
    t.start()
    try:
        delete_docs(spark, d, [1, 2, 3, 5, 8, 13])
        compact_index(spark, d, segment_size=64, max_salts=4)
    finally:
        stop.set()
        t.join(timeout=30)
    assert errors == [], errors
    # and the compacted index still answers
    hits = LocalSearcher(d).search("spark join", k=5, stem=False)
    assert all(doc not in (1, 2, 3, 5, 8, 13) for doc, _ in hits)
