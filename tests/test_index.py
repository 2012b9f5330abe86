"""M2/M3: materialized index build, query path, salting, resume
(SURVEY.md 5.3-5.5)."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.aggregates import postings_from_text
from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.index_query import IndexReader
from search_engine_spark.plans.manifest import Manifest
from search_engine_spark.plans.scoring import bm25_exhaustive
from tests.test_bm25 import QUERIES


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    # small segments + aggressive salting so multi-segment and salted
    # paths are exercised even on 500 docs
    build_index(
        spark, documents, d, n_buckets=8, segment_size=64, stem=False,
        salt_threshold=50, max_salts=4,
    )
    return d


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    return IndexReader(spark, index_dir)


@pytest.fixture(scope="module")
def flat(spark, documents):
    p = postings_from_text(documents, stem=False).cache()
    p.count()
    yield p
    p.unpersist()


def _decoded_set(reader, spark):
    dic = spark.read.parquet(reader.paths.dictionary)
    terms = [r.term for r in dic.select("term").distinct().collect()]
    buckets = [r.bucket for r in dic.select("bucket").distinct().collect()]
    return {
        (r.term, r.doc_id, r.tf, r.doclen)
        for r in reader.decoded_postings(terms, buckets).collect()
    }


def test_index_roundtrip_postings(spark, reader, flat):
    """Compressed segments decode to exactly the flat postings."""
    want = {(r.term, r.doc_id, r.tf, r.doclen) for r in flat.collect()}
    assert _decoded_set(reader, spark) == want


def test_segments_are_bounded_and_sorted(spark, reader):
    segs = spark.read.parquet(reader.paths.postings)
    bad = segs.filter(F.col("n") > 64).count()
    assert bad == 0
    r = segs.filter(F.col("n") > 1).first()
    assert r.first_doc < r.last_doc


def _rg_term_ranges(root):
    """[(path, [(min_term, max_term), ...in row-group order])] for
    every parquet file under a bucket-partitioned table."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for path in sorted(
        glob.glob(os.path.join(root, "bucket=*", "*.parquet"))
    ):
        pf = pq.ParquetFile(path)
        ti = pf.schema_arrow.get_field_index("term")
        md = pf.metadata
        ranges = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ti).statistics
            ranges.append((st.min, st.max))
        out.append((path, ranges))
    return out


def test_rowgroups_term_sorted_after_partitionby(spark, documents,
                                                 tmp_path_factory):
    """Round-3 layout regression: partitionBy(bucket) inserts its own
    sort by the partition column at write time unless the upstream
    sort already LEADS with it — a trailing (term, ...) sort gets
    scrambled and every row group spans the whole term range, silently
    disabling footer-stats pruning (measured 17x read amplification).
    Assert every file's row groups carry non-overlapping ascending
    term ranges, for the postings segments AND the positional table."""
    import os

    from search_engine_spark.plans.positions import build_positions

    d = str(tmp_path_factory.mktemp("index_layout"))
    build_index(spark, documents, d, n_buckets=4, segment_size=16,
                stem=False, salt_threshold=50, max_salts=4)
    build_positions(spark, documents, d, n_buckets=4, stem=False)

    import glob

    import pyarrow.parquet as pq

    for sub in ("postings", "positions"):
        # row-group footer stats must carve the term range...
        for path, ranges in _rg_term_ranges(os.path.join(d, sub)):
            for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
                assert lo_a <= hi_a, (sub, path)
                assert hi_a <= lo_b, (
                    sub, path, "row-group term ranges overlap — the "
                    "write-side sort no longer leads with the "
                    "partition column", (lo_a, hi_a), (lo_b, hi_b),
                )
        # ...and (small corpora fit one row group, which would pass
        # trivially) the rows INSIDE each file must be term-ascending
        n_checked = 0
        for path in sorted(
            glob.glob(os.path.join(d, sub, "bucket=*", "*.parquet"))
        ):
            terms = pq.read_table(path, columns=["term"])["term"].to_pylist()
            assert terms == sorted(terms), (sub, path)
            n_checked += len(terms)
        assert n_checked > 0, sub


def test_salting_engaged(spark, reader):
    """With threshold 50, hot terms must have split into >1 salt."""
    segs = spark.read.parquet(reader.paths.postings)
    n_salted = segs.filter(F.col("salt") > 0).count()
    assert n_salted > 0


@pytest.mark.parametrize("qid,qtext,k", QUERIES)
def test_index_query_equals_exhaustive(spark, reader, flat, qid, qtext, k):
    got = reader.search(qtext, k=k, stem=False).collect()
    want = bm25_exhaustive(spark, flat, qtext, k=k, stem=False).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in want], f"qid={qid}"
    for g, w in zip(got, want):
        assert g.score == pytest.approx(w.score, abs=1e-9)


def test_unsalted_build_identical(spark, documents, tmp_path_factory, reader):
    d2 = str(tmp_path_factory.mktemp("index_unsalted"))
    build_index(
        spark, documents, d2, n_buckets=8, segment_size=64, stem=False,
        salt_threshold=10**9,
    )
    r2 = IndexReader(spark, d2)
    assert _decoded_set(r2, spark) == _decoded_set(reader, spark)
    segs = spark.read.parquet(r2.paths.postings)
    assert segs.filter(F.col("salt") > 0).count() == 0


def test_resume_after_partial_build(spark, documents, tmp_path_factory, reader):
    """Crash-and-resume: build 3 buckets, 'crash', resume the rest.
    Final index must decode identically; manifest shows both runs."""
    d3 = str(tmp_path_factory.mktemp("index_resume"))
    s1 = build_index(
        spark, documents, d3, n_buckets=8, segment_size=64, stem=False,
        salt_threshold=50, max_salts=4, limit_buckets=3, run_id="run-one",
    )
    assert s1["buckets_built"] == 3
    m = Manifest(spark, d3).read()
    assert m.filter(F.col("status") == "done").count() == 3

    s2 = build_index(
        spark, documents, d3, n_buckets=8, segment_size=64, stem=False,
        salt_threshold=50, max_salts=4, resume=True, run_id="run-two",
    )
    assert s2["stage_a_skipped"] is True
    assert s2["buckets_built"] == 5
    r3 = IndexReader(spark, d3)
    assert _decoded_set(r3, spark) == _decoded_set(reader, spark)
    runs = {r.run_id for r in Manifest(spark, d3).read().collect()}
    assert runs == {"run-one", "run-two"}
    # resuming a complete index is a no-op
    s3 = build_index(spark, documents, d3, resume=True)
    assert s3["buckets_built"] == 0


def test_manifest_metrics(spark, reader, flat):
    m = Manifest(spark, reader.paths.root).read()
    total = m.agg(F.sum("n_postings")).collect()[0][0]
    assert total == flat.count()
    assert m.filter(F.col("bytes") <= 0).count() == 0


def test_search_batch_equals_per_query(spark, reader):
    """Batch mode (one Spark job for all queries) must return exactly
    the per-query results, including the conjunctive empty case."""
    queries = {
        "q1": "spark join",
        "q2": "data",
        "q3": "zzznotaword spark",  # unknown term -> empty under AND
    }
    batch = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 9))
        for r in reader.search_batch(queries, k=5).collect()
    }
    single = {}
    for qid, q in queries.items():
        for rank, r in enumerate(reader.search(q, k=5).collect(), 1):
            single[(qid, rank)] = (r.doc_id, round(r.score, 9))
    assert batch == single
    assert not any(qid == "q3" for qid, _ in batch)


def test_sql_surface_bm25_matches_index(spark, reader):
    """The index tables are plain SQL-queryable views: a pure spark.sql
    BM25 over postings_flat must reproduce the compressed-index path."""
    from search_engine_spark.plans.scoring import analyze_query
    from search_engine_spark.sources.catalog import register_index_views

    views = register_index_views(spark, reader.paths.root)
    assert "postings_flat" in views and "dictionary" in views
    terms = analyze_query("spark join", stem=True)
    in_list = ", ".join(f"'{t}'" for t in terms)
    sql_hits = spark.sql(f"""
        WITH st AS (SELECT count(*) AS n_docs, avg(doclen) AS avgdl
                    FROM (SELECT DISTINCT doc_id, doclen FROM postings_flat)),
        dfs AS (SELECT term, count(*) AS df FROM postings_flat
                WHERE term IN ({in_list}) GROUP BY term),
        scored AS (
          SELECT p.doc_id,
                 ln(1.0 + (st.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
                   * p.tf * 2.2
                   / (p.tf + 1.2 * (0.25 + 0.75 * p.doclen / st.avgdl))
                   AS partial
          FROM postings_flat p
          JOIN dfs ON p.term = dfs.term CROSS JOIN st
          WHERE p.term IN ({in_list})
        )
        SELECT doc_id, sum(partial) AS score, count(*) AS n_matched
        FROM scored GROUP BY doc_id
        HAVING n_matched = {len(terms)}
        ORDER BY score DESC, doc_id ASC LIMIT 10
    """).collect()
    idx_hits = reader.search("spark join", k=10).collect()
    assert [(r.doc_id, round(r.score, 9)) for r in sql_hits] == [
        (r.doc_id, round(r.score, 9)) for r in idx_hits
    ]


def test_extend_index_converges_to_full_rebuild(spark, documents, tmp_path_factory):
    """Appending docs via extend_index must produce the same index a
    full rebuild over the union corpus produces (tables and query
    results), and the manifest must show the invalidation lineage."""
    from search_engine_spark.plans.build_index import build_index, extend_index
    from search_engine_spark.plans.index_query import IndexReader

    base = documents.filter(F.col("doc_id") < 300)
    extra = documents.filter(F.col("doc_id") >= 300)
    d_inc = str(tmp_path_factory.mktemp("idx_inc"))
    d_full = str(tmp_path_factory.mktemp("idx_full"))
    kw = dict(n_buckets=8, segment_size=64, stem=True,
              salt_threshold=50, max_salts=4)
    build_index(spark, base, d_inc, **kw)
    extend_index(spark, extra, d_inc, segment_size=64, max_salts=4)
    build_index(spark, documents, d_full, **kw)

    def table(d, name, cols):
        return sorted(
            tuple(row[c] for c in cols)
            for row in spark.read.parquet(f"{d}/{name}").select(*cols).collect()
        )

    assert table(d_inc, "dictionary", ["term", "bucket", "df", "cf"]) == \
           table(d_full, "dictionary", ["term", "bucket", "df", "cf"])
    assert table(d_inc, "docs", ["doc_id", "doclen"]) == \
           table(d_full, "docs", ["doc_id", "doclen"])
    assert table(d_inc, "stats", ["n_docs", "avgdl"]) == \
           table(d_full, "stats", ["n_docs", "avgdl"])
    seg_cols = ["bucket", "term", "salt", "seg", "n", "doc_ids", "tfs",
                "doclens", "max_tfnorm", "first_doc", "last_doc"]
    assert table(d_inc, "postings", seg_cols) == table(d_full, "postings", seg_cols)

    ri, rf = IndexReader(spark, d_inc), IndexReader(spark, d_full)
    for q in ("spark join", "data", "the filter"):
        assert [(r.doc_id, round(r.score, 9)) for r in ri.search(q, k=10).collect()] == \
               [(r.doc_id, round(r.score, 9)) for r in rf.search(q, k=10).collect()]

    m = spark.read.parquet(f"{d_inc}/manifest")
    assert m.filter(F.col("status") == "invalidated").count() > 0
    assert m.select("run_id").distinct().count() >= 2


def test_spimi_randomized_small_batches(spark, tmp_path_factory):
    """Index == exhaustive under pathological batching: tiny Arrow
    batches force the partial builder's carry across MANY batch
    boundaries and the merge segmenter's streaming finalize; random
    doc->partition placement makes partial doc ranges interleave."""
    import numpy as np

    from search_engine_spark.plans.index_query import IndexReader
    from tests.oracle import brute_force_topk

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        rng = np.random.default_rng(99)
        vocab = [f"w{i}" for i in range(20)]
        probs = np.arange(1, 21, dtype=float) ** -1.2
        probs /= probs.sum()
        docs = []
        for did in rng.permutation(400).tolist():  # scrambled id order
            n = int(rng.integers(1, 30))
            docs.append((did, " ".join(rng.choice(vocab, p=probs, size=n))))
        df = spark.createDataFrame(docs, "doc_id long, text string").repartition(7)
        d = str(tmp_path_factory.mktemp("spimi_small"))
        build_index(spark, df, d, n_buckets=4, segment_size=16, stem=False,
                    salt_threshold=50, max_salts=3)
        reader = IndexReader(spark, d)
        for qterms in (["w0"], ["w0", "w3"], ["w1", "w5", "w9"]):
            got = [(r.doc_id, round(r.score, 9))
                   for r in reader.search(qterms, k=12, stem=False).collect()]
            want = [(x, round(s, 9))
                    for x, s in brute_force_topk(docs, qterms, k=12)]
            assert got == want, qterms
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_index_stats_footer_walk(spark, reader, flat):
    """index_admin.py stats: footer-only introspection must agree with
    the actual table contents (no Spark job, no data read)."""
    from index_admin import index_stats

    st = index_stats(reader.paths.root)
    assert st["n_docs"] == reader.n_docs
    assert st["n_buckets"] == reader.n_buckets
    assert st["postings_flat"]["rows"] == flat.count()
    dic = spark.read.parquet(reader.paths.dictionary)
    assert st["vocabulary"] == dic.count()
    assert st["postings"]["buckets"] == 8
    assert st["bytes_per_posting"] > 0
    assert st["postings"]["bucket_skew"] >= 1.0
