"""LSM-cadence streaming ingest (streaming/incremental.py
start_shard_ingest + fold_shards): each micro-batch builds a full
shard index; folds segment-append it via merge_into — O(epoch) per
fold, never a rebuild of the serving index. Properties pinned here:

- two-epoch stream + fold == a fresh batch build over the union
  corpus (dictionary rows, collection stats, and search results —
  the same bar tests/test_merge.py holds merge_into to);
- folds are idempotent (the ledger skips consumed epochs) and refuse
  a torn 'folding' state instead of double-ingesting;
- the pages-shaped variant dedups per epoch, builds from html, and
  carries the urlmap through the fold with offset ids.
"""

import json
import os

import pandas as pd
import pytest

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.wand import LocalSearcher
from search_engine_spark.streaming.incremental import (
    fold_shards,
    start_shard_ingest,
)

KW = dict(n_buckets=4, segment_size=32, stem=False,
          salt_threshold=40, max_salts=4)
QUERIES = [("spark", 10), ("the join", 10), ("scan", 5)]


def _pdf(lo, hi):
    rows = []
    for i in range(lo, hi):
        text = (
            "" if i % 9 == 3
            else " ".join(["spark"] * (i % 3 + 1))
            + f" doc number{i} the join fast scan"
        )
        rows.append((i - lo, text))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def folded(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lsm")
    arrivals = str(root / "arrivals")
    os.makedirs(arrivals)
    a, b = _pdf(0, 60), _pdf(60, 100)
    # two files -> maxFilesPerTrigger=1 -> two epochs in arrival order
    a.to_parquet(os.path.join(arrivals, "part-000.parquet"))
    b.to_parquet(os.path.join(arrivals, "part-001.parquet"))
    shards, idx = str(root / "shards"), str(root / "idx")
    q = start_shard_ingest(
        spark, arrivals, shards, max_files_per_trigger=1, **KW
    )
    q.awaitTermination(300)
    res = fold_shards(spark, shards, idx)
    return root, arrivals, shards, idx, res


def test_fold_summary_and_idempotency(spark, folded):
    _, _, shards, idx, res = folded
    assert res["epochs_folded"] == 2
    assert res["epochs"] == ["epoch=0", "epoch=1"]
    # replay: ledger skips consumed epochs
    again = fold_shards(spark, shards, idx)
    assert again["epochs_folded"] == 0


def test_fold_equals_fresh_build(spark, folded, tmp_path):
    root, _, _, idx, _ = folded
    # fresh build over the union with the SAME id layout the fold
    # produces (epoch 1's ids offset past epoch 0's allocated max)
    union = pd.concat([
        _pdf(0, 60), _pdf(60, 100).assign(doc_id=lambda d: d.doc_id + 60),
    ])
    full = str(tmp_path / "full")
    build_index(spark, spark.createDataFrame(union), full, **KW)

    def dict_rows(d):
        return {
            (r.term, r.df, r.cf)
            for r in spark.read.parquet(os.path.join(d, "dictionary"))
            .select("term", "df", "cf").collect()
        }

    assert dict_rows(idx) == dict_rows(full)
    si, sf = LocalSearcher(idx), LocalSearcher(full)
    assert (si.n_docs, si.avgdl) == (sf.n_docs, sf.avgdl)
    for q, k in QUERIES:
        for m in ("and", "or"):
            assert si.search(q, k=k, stem=False, mode=m) == \
                sf.search(q, k=k, stem=False, mode=m), (q, m)


def test_torn_ledger_refuses(spark, folded):
    _, _, shards, idx, _ = folded
    ledger_path = os.path.join(idx, "ingested_epochs.json")
    with open(ledger_path) as f:
        ledger = json.load(f)
    try:
        ledger["epoch=1"] = "folding"
        with open(ledger_path, "w") as f:
            json.dump(ledger, f)
        with pytest.raises(RuntimeError, match="interrupted folds"):
            fold_shards(spark, shards, idx)
    finally:
        ledger["epoch=1"] = "done"
        with open(ledger_path, "w") as f:
            json.dump(ledger, f)


def test_stream_replay_converges(spark, folded):
    """Re-running the stream with the SAME checkpoint delivers no new
    epochs (exactly-once at the source); a replayed epoch directory
    rebuild (simulated by deleting one shard's _SUCCESS-free copy)
    would converge because process() rebuilds from scratch."""
    _, arrivals, shards, _, _ = folded
    q = start_shard_ingest(
        spark, arrivals, shards, max_files_per_trigger=1, **KW
    )
    q.awaitTermination(120)
    epochs = sorted(
        e for e in os.listdir(shards) if e.startswith("epoch=")
    )
    assert epochs == ["epoch=0", "epoch=1"]  # nothing re-delivered


def _pages_pdf(lo, hi):
    rows = []
    for i in range(lo, hi):
        body = f"spark data doc{i} " + "join " * (i % 3 + 1)
        rows.append((
            f"https://ex.com/p{i}",
            pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i),
            f"<html><body>{body}</body></html>".encode(),
            None,
            "en",
        ))
    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    # all-None text must stay a STRING column in parquet (a null-typed
    # column would not match the stream's schema), and pandas'
    # nanosecond timestamps must coerce to the microseconds Spark's
    # timestamp type reads
    pdf["text"] = pdf["text"].astype("string")
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    return pdf


def test_pages_variant_carries_urlmap(spark, tmp_path):
    arrivals = str(tmp_path / "arrivals")
    os.makedirs(arrivals)
    _pages_pdf(0, 30).to_parquet(
        os.path.join(arrivals, "p0.parquet")
    )
    _pages_pdf(30, 50).to_parquet(
        os.path.join(arrivals, "p1.parquet")
    )
    shards, idx = str(tmp_path / "shards"), str(tmp_path / "idx")
    q = start_shard_ingest(
        spark, arrivals, shards, pages=True,
        max_files_per_trigger=1, **KW
    )
    q.awaitTermination(300)
    res = fold_shards(spark, shards, idx)
    assert res["epochs_folded"] == 2
    um = spark.read.parquet(os.path.join(idx, "urlmap")).toPandas()
    assert len(um) == 50
    assert um.doc_id.nunique() == 50  # offset ids never collide
    assert set(um.url) == {f"https://ex.com/p{i}" for i in range(50)}
    # the folded index answers over BOTH epochs' docs
    hits = LocalSearcher(idx).search("spark data", k=50, stem=False)
    assert len(hits) == 50
