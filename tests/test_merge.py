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


def test_merge_carries_static_boosts(spark, dirs, tmp_path):
    """Boosts are per-doc side data: the merged index must serve a's
    boosts at their original ids and b's at offset ids (a silently
    dropped boosts table would quietly unboost every incoming doc).
    Asymmetric sides are legal — here only b carries boosts."""
    import shutil

    a, b, _, _ = dirs
    a2, b2 = str(tmp_path / "a2"), str(tmp_path / "b2")
    shutil.copytree(a, a2)
    shutil.copytree(b, b2)
    spark.createDataFrame(
        [(5, 1.5), (12, 0.25)], "doc_id long, boost double"
    ).write.parquet(os.path.join(b2, "boosts"))
    out = str(tmp_path / "out2")
    summary = merge_indexes(spark, a2, b2, out)
    assert summary["boosts_merged"]
    bt = pd.read_parquet(os.path.join(out, "boosts"))
    assert sorted(bt.doc_id.tolist()) == [60 + 5, 60 + 12]
    s = LocalSearcher(out)
    assert s._boost is not None
    exp = s.explain_score("the", 60 + 5, stem=False)
    assert exp["static_boost"] == pytest.approx(1.5, abs=1e-12)
    # symmetric case: both sides boosted -> union with offset
    spark.createDataFrame(
        [(0, 2.0)], "doc_id long, boost double"
    ).write.parquet(os.path.join(a2, "boosts"))
    out2 = str(tmp_path / "out3")
    merge_indexes(spark, a2, b2, out2, rebuild=True)
    bt2 = pd.read_parquet(os.path.join(out2, "boosts"))
    assert sorted(bt2.doc_id.tolist()) == [0, 65, 72]


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


def test_append_mode_summary(spark, dirs):
    """Default merge is the O(incoming) segment append — no stage-B
    rebuild — and records the merge markers serving needs."""
    import json

    _, _, out, _ = dirs
    with open(os.path.join(out, "index_meta.json")) as f:
        meta = json.load(f)
    assert meta["salt_generation"] == 1
    assert meta["n_docs"] > 0 and meta["sum_doclen"] > 0


def test_merge_rebuild_equals_append(spark, dirs, tmp_path):
    """rebuild=True (canonicalizing merge) ranks identically to the
    segment-append path — and resets the merge markers."""
    import json

    a, b, out, _ = dirs
    out2 = str(tmp_path / "rebuilt")
    merge_indexes(spark, a, b, out2, segment_size=32, max_salts=4,
                  rebuild=True)
    with open(os.path.join(out2, "index_meta.json")) as f:
        meta = json.load(f)
    assert meta.get("salt_generation", 0) == 0
    assert meta.get("tfnorm_scale", 1.0) == 1.0
    sa, sb = LocalSearcher(out), LocalSearcher(out2)
    assert (sa.n_docs, sa.avgdl) == (sb.n_docs, sb.avgdl)
    for q, k in QUERIES:
        if "|" in q:
            assert sa.search_grouped(q, k=k, stem=False) == \
                sb.search_grouped(q, k=k, stem=False), q
        else:
            for m in ("and", "or"):
                assert sa.search(q, k=k, stem=False, mode=m) == \
                    sb.search(q, k=k, stem=False, mode=m), (q, m)


def test_second_merge_generation(spark, dirs, tmp_path):
    """A merged index can be merged AGAIN: generation-shifted salts
    keep (term, salt, seg) keys unique, df/cf stay additive, and the
    result still ranks identically to a fresh three-shard build.
    fsck's decode-level invariants hold on the twice-merged index."""
    from search_engine_spark.plans.fsck import fsck
    from search_engine_spark.plans.merge import merge_into

    a, b, out, _ = dirs
    kw = dict(n_buckets=4, segment_size=32, stem=False,
              salt_threshold=40, max_salts=4)
    c_src = _corpus(spark, 100, 130)
    c = str(tmp_path / "c")
    build_index(spark, c_src, c, **kw)
    c_src.select("doc_id", "url").sort("doc_id").write.parquet(
        os.path.join(c, "urlmap")
    )
    # fold c INTO a copy of the (a+b) merge — the LSM cadence
    import shutil

    out2 = str(tmp_path / "out2")
    shutil.copytree(out, out2)
    summary = merge_into(spark, out2, c)
    assert summary["doc_id_offset"] == 100  # past a+b's urlmap max
    import json

    with open(os.path.join(out2, "index_meta.json")) as f:
        assert json.load(f)["salt_generation"] == 2

    full3 = str(tmp_path / "full3")
    union = (
        _corpus(spark, 0, 60)
        .unionByName(_corpus(spark, 60, 100)
                     .withColumn("doc_id", F.col("doc_id") + F.lit(60)))
        .unionByName(c_src.withColumn("doc_id",
                                      F.col("doc_id") + F.lit(100)))
    )
    build_index(spark, union, full3, **kw)
    sa, sb = LocalSearcher(out2), LocalSearcher(full3)
    assert (sa.n_docs, sa.avgdl) == (sb.n_docs, sb.avgdl)
    for q, k in QUERIES:
        if "|" in q:
            assert sa.search_grouped(q, k=k, stem=False) == \
                sb.search_grouped(q, k=k, stem=False), q
        else:
            for m in ("and", "or"):
                assert sa.search(q, k=k, stem=False, mode=m) == \
                    sb.search(q, k=k, stem=False, mode=m), (q, m)
    report = fsck(out2, sample_terms=50)
    assert report["ok"], report["errors"]


def _phrase_corpus(spark, lo, hi):
    rows = []
    for i in range(lo, hi):
        text = (
            f"alpha beta gamma doc{i} " * (i % 3 + 1)
            + "the quick brown fox "
            + ("alpha gamma " if i % 2 else "beta alpha beta ")
        ).strip()
        rows.append((i - lo, text, f"https://ex.com/q{i}"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "url"])
    )


def test_merge_with_positions(spark, tmp_path):
    """merge folds the positional table too (doc_id offset, bucket-led
    sorted appends): phrase search over the merged index equals a
    fresh positions build over the union corpus; an asymmetric
    positions table is refused."""
    from search_engine_spark.plans.positions import (
        PhraseSearcher,
        build_positions,
    )

    a_src, b_src = _phrase_corpus(spark, 0, 30), _phrase_corpus(spark, 30, 50)
    a, b, out, full = (str(tmp_path / n) for n in ("a", "b", "out", "full"))
    kw = dict(n_buckets=4, segment_size=32, stem=False)
    build_index(spark, a_src, a, **kw)
    build_index(spark, b_src, b, **kw)
    for d, src in ((a, a_src), (b, b_src)):
        src.select("doc_id", "url").sort("doc_id").write.parquet(
            os.path.join(d, "urlmap")
        )
    build_positions(spark, a_src, a, n_buckets=4, stem=False)
    # asymmetric positions -> refused before anything is written
    with pytest.raises(ValueError, match="positions"):
        merge_indexes(spark, a, b, str(tmp_path / "asym"))
    build_positions(spark, b_src, b, n_buckets=4, stem=False)

    summary = merge_indexes(spark, a, b, out)
    assert summary["positions_merged"]

    union = a_src.unionByName(
        b_src.withColumn("doc_id", F.col("doc_id") + F.lit(30))
    )
    build_index(spark, union, full, **kw)
    build_positions(spark, union, full, n_buckets=4, stem=False)
    pa, pf = PhraseSearcher(out), PhraseSearcher(full)
    for q in ("alpha beta", "beta alpha beta", "quick brown fox",
              "alpha gamma", "gamma alpha"):
        assert pa.phrase_counts(pa.phrase_terms(q)) == \
            pf.phrase_counts(pf.phrase_terms(q)), q
        assert pa.search_phrase(q, k=5) == pf.search_phrase(q, k=5), q
    assert pa.near_counts("alpha", "fox", 6) == \
        pf.near_counts("alpha", "fox", 6)


def test_merge_appends_docstore(spark, tmp_path):
    """Docstore/urlmap merge keeps both sides servable (and the 1 MiB
    row-group seek layout is applied to the appended files)."""
    from search_engine_spark.plans.docstore import DocStore, build_docstore

    a_src, b_src = _corpus(spark, 0, 25), _corpus(spark, 25, 40)
    a, b, out = (str(tmp_path / n) for n in ("a", "b", "out"))
    kw = dict(n_buckets=4, segment_size=32, stem=False)
    build_index(spark, a_src, a, **kw)
    build_index(spark, b_src, b, **kw)
    for d, src in ((a, a_src), (b, b_src)):
        src.select("doc_id", "url").sort("doc_id").write.parquet(
            os.path.join(d, "urlmap")
        )
        build_docstore(spark, src, d)
    summary = merge_indexes(spark, a, b, out)
    assert summary["docstore_merged"] and summary["urlmap_merged"]
    store = DocStore(out)
    texts_a = {r.doc_id: r.text for r in a_src.collect()}
    texts_b = {r.doc_id + 25: r.text for r in b_src.collect()}
    got = store.get_texts(list(texts_a) + list(texts_b))
    assert got == {**texts_a, **texts_b}


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
