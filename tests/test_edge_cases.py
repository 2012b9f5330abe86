"""Edge coverage: Unicode corpora end-to-end and hot-term/huge-doc
boundedness through the full build + both query paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.text import analyze, tokenize
from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.index_query import IndexReader
from search_engine_spark.plans.wand import LocalSearcher


def test_unicode_corpus_end_to_end(spark, tmp_path):
    """CJK / accents / emoji / mixed-script docs index and query
    consistently across the exhaustive, distributed-index, and local
    WAND paths."""
    rows = [
        (0, "数据 处理 系统 数据"),
        (1, "café naïve résumé café"),
        (2, "hello 世界 hello world"),
        (3, "emoji 🙂 stays out of \\w+ tokens emoji"),
        (4, "ПРИВЕТ мир привет"),
        (5, "mixed 数据 café привет world"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "uidx")
    build_index(spark, docs, d, n_buckets=4, segment_size=8, stem=True,
                salt_threshold=100, max_salts=2)
    reader = IndexReader(spark, d)
    local = LocalSearcher(d)

    for q, expect_docs in (
        ("数据", {0, 5}),      # han run is one \w token
        ("café", {1, 5}),
        ("привет", {4, 5}),  # casefolded match
    ):
        dist = {r.doc_id for r in reader.search(q, k=10).collect()}
        loc = {d_ for d_, _ in local.search(q, k=10)}
        assert dist == loc == expect_docs, q
    # emoji is not a \w token: never indexed, conjunctive query empty
    assert tokenize("🙂") == []
    assert local.search("🙂", k=5) == []


def test_casefold_and_nfkc_consistency():
    assert analyze("CAFÉ Café café", stem=False) == ["café", "café", "café"]
    assert analyze("ＦＵＬＬｗｉｄｔｈ", stem=False) == ["fullwidth"]  # NFKC


def test_huge_hot_doc_bounded(spark, tmp_path):
    """A single 120k-token doc + a term present in every doc: segments
    stay fixed-size, salting splits the hot term, queries agree."""
    big = " ".join(["hot"] * 60_000 + ["filler", "hot"] * 30_000)
    rows = [(0, big)] + [(i, f"hot doc{i} word{i % 7}") for i in range(1, 40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "bigidx")
    build_index(spark, docs, d, n_buckets=4, segment_size=16, stem=False,
                salt_threshold=10, max_salts=4)
    segs = spark.read.parquet(f"{d}/postings")
    assert segs.agg(F.max("n")).collect()[0][0] <= 16  # bounded segments
    hot = segs.filter(F.col("term") == "hot")
    assert hot.select("salt").distinct().count() > 1  # salting engaged
    reader = IndexReader(spark, d)
    local = LocalSearcher(d)
    dist = [(r.doc_id, round(r.score, 9)) for r in reader.search(["hot"], k=5).collect()]
    loc = [(d_, round(s, 9)) for d_, s in local.search(["hot"], k=5)]
    assert dist == loc
    assert dist[0][0] == 0  # the giant doc dominates tf


def test_read_batch_parsing(tmp_path):
    """query.py --batch file format: blank lines skipped, optional
    id<TAB>text, default ids are 1-based line numbers."""
    from query import _read_batch

    p = tmp_path / "queries.txt"
    p.write_text("spark join\n\nhot\tthe data\n  \nplain one\n")
    qs = _read_batch(str(p))
    assert qs == {"q1": "spark join", "hot": "the data", "q5": "plain one"}


def test_read_batch_duplicate_id_is_an_error(tmp_path):
    """A duplicate query id would silently drop an earlier query from
    the batch results — refuse instead."""
    import pytest

    from query import _read_batch

    p = tmp_path / "dup.txt"
    p.write_text("a\tone\na\ttwo\n")
    with pytest.raises(SystemExit, match="duplicate query id"):
        _read_batch(str(p))
    # an explicit id colliding with an auto line-number id also errors
    p2 = tmp_path / "dup2.txt"
    p2.write_text("q2\texplicit\nauto line two\n")
    with pytest.raises(SystemExit, match="duplicate query id"):
        _read_batch(str(p2))


def test_partial_builder_multibatch_carry(spark, tmp_path):
    """SPIMI regression (caught only at 600k scale in round 2): a term
    whose run spans MANY Arrow batches within one partition must be
    carried across batch boundaries without double-emitting or
    splitting postings. 25k single-term docs in ONE partition >> the
    10k maxRecordsPerBatch, so the builder sees several whole batches
    that all continue the same carry run, plus term changes landing
    mid-batch."""
    from tests.oracle import brute_force_topk

    n = 25_000
    rows = [(i, "aaa common") for i in range(n)]
    rows += [(n + i, f"zz{i % 5} common tail") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    d = str(tmp_path / "carryidx")
    build_index(spark, docs, d, n_buckets=4, segment_size=512, stem=False,
                salt_threshold=1_000_000, max_salts=4)
    segs = spark.read.parquet(f"{d}/postings")
    by_term = {
        r.term: r.total
        for r in segs.groupBy("term").agg(F.sum("n").alias("total")).collect()
    }
    assert by_term["aaa"] == n          # no loss, no double-emit
    assert by_term["common"] == n + 200
    # decoded postings are exactly the doc range, each once
    reader = IndexReader(spark, d)
    got = sorted(
        r.doc_id for r in reader.decoded_postings(["aaa"], [0, 1, 2, 3])
        .select("doc_id").collect()
    )
    assert got == list(range(n))
    # scores agree with brute force end-to-end
    corpus = [(i, t) for i, t in rows]
    want = brute_force_topk(corpus, ["common", "aaa"], k=5)
    local = LocalSearcher(d)
    got_q = local.search(["common", "aaa"], k=5, stem=False)
    assert [x for x, _ in got_q] == [x for x, _ in want]
