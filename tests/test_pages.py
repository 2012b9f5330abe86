"""pages-shaped input (BASELINE.json input_hint): generator fixtures,
extraction invariant, recency dedup, dense id minting, full build."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.text import extract_text
from search_engine_spark.operators.dedup import latest_snapshot
from search_engine_spark.operators.ids import assign_dense_ids
from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.index_query import IndexReader
from search_engine_spark.plans.wand import LocalSearcher
from search_engine_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, 300, partitions=4).cache()
    df.count()
    yield df
    df.unpersist()


def test_schema(pages):
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"
    ]


def test_deterministic(spark, pages):
    again = generate_pages(spark, 300, partitions=7)  # different partitioning
    a = {r.url + "|" + str(r.warc_ts): r.text for r in pages.collect()}
    b = {r.url + "|" + str(r.warc_ts): r.text for r in again.collect()}
    assert a == b


def test_extract_invariant(pages):
    """extract_text(html) == text for every generated row (the per-row
    byte-identical invariant from BASELINE.json input_hint)."""
    for r in pages.collect():
        assert extract_text(r.html) == r.text, r.url


def test_fixture_coverage(pages):
    rows = pages.collect()
    urls = [r.url for r in rows]
    assert len(urls) > len(set(urls))  # recrawl dups present
    assert any(r.text == "" for r in rows)  # empty bodies present
    assert {r.lang for r in rows} == {"en", "fr", "es", "zh", "de"}


def test_latest_snapshot(pages):
    deduped = latest_snapshot(pages, "url", "warc_ts")
    assert deduped.count() == pages.select("url").distinct().count()
    # kept row per dup url must be the max warc_ts
    mx = pages.groupBy("url").agg(F.max("warc_ts").alias("warc_ts"))
    assert deduped.select("url", "warc_ts").exceptAll(mx).count() == 0


def test_dense_ids(pages):
    deduped = latest_snapshot(pages, "url", "warc_ts")
    with_ids = assign_dense_ids(deduped, "url")
    rows = with_ids.select("url", "doc_id").collect()
    n = len(rows)
    ids = sorted(r.doc_id for r in rows)
    assert ids == list(range(n))  # dense 0..n-1
    # deterministic: id order == url sort order
    by_url = sorted(rows, key=lambda r: r.url)
    assert [r.doc_id for r in by_url] == list(range(n))


def test_end_to_end_from_html(spark, pages, tmp_path_factory):
    """Build from the html column only (text withheld) and query."""
    d = str(tmp_path_factory.mktemp("pages_idx"))
    src = latest_snapshot(pages, "url", "warc_ts").withColumn(
        "text", F.lit(None).cast("string")
    )
    src = assign_dense_ids(src, "url")
    build_index(spark, src, d, n_buckets=8, segment_size=128,
                stem=True, html_col="html", salt_threshold=100, max_salts=4)
    reader = IndexReader(spark, d)
    spark_hits = reader.search("spark data", k=10, stem=True).collect()
    local_hits = LocalSearcher(d).search("spark data", k=10, stem=True)
    assert [r.doc_id for r in spark_hits] == [x for x, _ in local_hits]
    assert len(spark_hits) > 0
    for r, (_, s) in zip(spark_hits, local_hits):
        assert abs(r.score - s) < 1e-9
