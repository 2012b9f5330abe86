"""plans/merge: tiered index merge == fresh build over the union
corpus (the parallel-ingest convergence property), plus the physical
invariant guards."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.merge import merge_indexes
from search_engine_spark.plans.wand import LocalSearcher

QUERIES = [("the", 15), ("spark join", 10), ("fast|scan the", 10)]


def _corpus(spark, lo, hi, empty_every=9):
    rows = []
    for i in range(lo, hi):
        text = (
            "" if i % empty_every == 3
            else " ".join(["spark"] * (i % 3 + 1))
            + f" doc number{i} the join fast scan"
        )
        rows.append((i - lo, text, f"https://ex.com/p{i}"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "url"])
    )


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    a_src = _corpus(spark, 0, 60)
    b_src = _corpus(spark, 60, 100)
    a, b, out, full = (str(root / n) for n in ("a", "b", "out", "full"))
    kw = dict(n_buckets=4, segment_size=32, stem=False,
              salt_threshold=40, max_salts=4)
    build_index(spark, a_src, a, **kw)
    build_index(spark, b_src, b, **kw)
    # urlmaps so the merge exercises the side tables + allocated-id
    # offset (empty docs hold ids postings never see)
    for d, src in ((a, a_src), (b, b_src)):
        src.select("doc_id", "url").sort("doc_id").write.parquet(
            os.path.join(d, "urlmap")
        )
    merge_indexes(spark, a, b, out, segment_size=32, max_salts=4)
    # fresh build over the union with the SAME id layout the merge
    # produces (b's ids offset past a's allocated max = 59 + 1)
    union = a_src.unionByName(
        b_src.withColumn("doc_id", F.col("doc_id") + F.lit(60))
    )
    build_index(spark, union, full, **kw)
    return a, b, out, full


def test_merge_equals_fresh_build(spark, dirs):
    _, _, out, full = dirs

    def dict_rows(d):
        return {
            (r.term, r.df, r.cf)
            for r in spark.read.parquet(os.path.join(d, "dictionary"))
            .select("term", "df", "cf").collect()
        }

    assert dict_rows(out) == dict_rows(full)
    sa, sb = LocalSearcher(out), LocalSearcher(full)
    assert (sa.n_docs, sa.avgdl) == (sb.n_docs, sb.avgdl)
    for q, k in QUERIES:
        if "|" in q:
            assert sa.search_grouped(q, k=k, stem=False) == \
                sb.search_grouped(q, k=k, stem=False), q
        else:
            for m in ("and", "or"):
                assert sa.search(q, k=k, stem=False, mode=m) == \
                    sb.search(q, k=k, stem=False, mode=m), (q, m)


def test_merge_unions_urlmap_with_offset(spark, dirs):
    a, _, out, _ = dirs
    um = pd.read_parquet(os.path.join(out, "urlmap"))
    assert um.url.is_unique and um.doc_id.is_unique
    assert len(um) == 100
    # b's urls live above a's allocated ceiling
    assert um[um.url == "https://ex.com/p99"].doc_id.iloc[0] == 60 + 39


def _pages(spark, lo, hi):
    rows = []
    for i in range(lo, hi):
        title = f"title number{i} spark"
        body = " ".join(["join"] * (i % 3 + 1)) + f" body number{i} the fast"
        html = f"<html><head><title>{title}</title></head><body>{body}</body></html>"
        rows.append((i - lo, html.encode(), f"{title} {body}",
                     f"https://ex.com/p{i}"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "html", "text", "url"])
    )


def test_merge_with_title_field(spark, tmp_path):
    """Field indexes share the doc_id space: the merge must fold
    fields/title with the SAME offset, converging to a fresh two-index
    build over the union; an asymmetric title field is refused."""
    from search_engine_spark.plans.multifield import (
        MultiFieldSearcher,
        build_title_index,
    )

    a_src, b_src = _pages(spark, 0, 40), _pages(spark, 40, 70)
    a, b, out, full = (str(tmp_path / n) for n in ("a", "b", "out", "full"))
    kw = dict(n_buckets=4, segment_size=32, stem=False, html_col="html")
    build_index(spark, a_src, a, **kw)
    build_index(spark, b_src, b, **kw)
    build_title_index(spark, a_src, a, n_buckets=2, stem=False)
    # asymmetric title -> refused
    with pytest.raises(ValueError, match="title"):
        merge_indexes(spark, a, b, str(tmp_path / "asym"))
    build_title_index(spark, b_src, b, n_buckets=2, stem=False)

    summary = merge_indexes(spark, a, b, out, segment_size=32)
    assert summary["title_merged"]

    union = a_src.unionByName(
        b_src.withColumn("doc_id", F.col("doc_id") + F.lit(40))
    )
    build_index(spark, union, full, **kw)
    build_title_index(spark, union, full, n_buckets=2, stem=False)
    for q in ("spark join", "number12 the", "fast"):
        got = MultiFieldSearcher(out, title_weight=2.0).search(
            q, k=12, stem=False
        )
        want = MultiFieldSearcher(full, title_weight=2.0).search(
            q, k=12, stem=False
        )
        assert got == want, q


def test_merge_guards(spark, dirs, tmp_path):
    a, b, _, _ = dirs
    other = str(tmp_path / "othern")
    build_index(spark, _corpus(spark, 0, 20), other, n_buckets=8,
                segment_size=32, stem=False)
    with pytest.raises(ValueError, match="n_buckets"):
        merge_indexes(spark, a, other, str(tmp_path / "x"))
    from search_engine_spark.plans.deletes import delete_docs

    delete_docs(spark, b, [0])
    with pytest.raises(ValueError, match="tombstones"):
        merge_indexes(spark, a, b, str(tmp_path / "y"))
