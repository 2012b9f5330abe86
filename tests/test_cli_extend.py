"""CLI-level extend regression: an index whose corpus contains
empty-extraction docs (doc dropped from postings but present in
urlmap) must extend without doc_id collisions.

The round-2 bug: build_index.py offset new ids by meta['n_docs']
(= docs with >=1 posting) instead of max(doc_id)+1; with empty docs
in the first corpus the ranges overlapped and stage B crashed on
duplicate (term, doc_id) postings."""

import json
import os
import subprocess
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pages_pdf(n, *, start=0, empty_every=7):
    rows = []
    for i in range(start, start + n):
        if i % empty_every == 3:
            text = ""
        else:
            # i-varying tf/doclen so BM25 scores are mostly distinct
            text = " ".join(["spark"] * (i % 3 + 1)) + f" doc number{i} join fast"
        rows.append((
            f"https://ex.com/p{i}",
            pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i),
            f"<html><body>{text}</body></html>".encode(),
            text,
            "en",
        ))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def _run_cli(args):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, capture_output=True, text=True,
        timeout=420,
    )


def test_cli_extend_with_empty_docs(spark, tmp_path):
    first = _pages_pdf(40)
    second = _pages_pdf(60)  # 40 old urls + 20 new
    p1 = os.path.join(str(tmp_path), "pages1")
    p2 = os.path.join(str(tmp_path), "pages2")
    spark.createDataFrame(first).write.parquet(p1)
    spark.createDataFrame(second).write.parquet(p2)
    idx = os.path.join(str(tmp_path), "idx")
    full = os.path.join(str(tmp_path), "idx_full")

    r = _run_cli(["build_index.py", "--input", p1, "--input-format", "pages",
                  "--index-dir", idx, "--n-buckets", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli(["build_index.py", "--input", p2, "--input-format", "pages",
                  "--index-dir", idx, "--n-buckets", "4", "--extend"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["buckets_rebuilt"] > 0

    # no duplicate (term, doc_id) postings after the extend
    flat = spark.read.parquet(os.path.join(idx, "postings_flat"))
    dups = (
        flat.groupBy("term", "doc_id").count().filter("count > 1").count()
    )
    assert dups == 0

    # extended index answers identically to a full rebuild over the
    # union corpus (ids differ; compare by url)
    r = _run_cli(["build_index.py", "--input", p2, "--input-format", "pages",
                  "--index-dir", full, "--n-buckets", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    from search_engine_spark.plans.wand import LocalSearcher

    def urls_for(index_dir, qtext):
        s = LocalSearcher(index_dir)
        # k >= corpus: the FULL result set — a multiset of (url, score)
        # is id-assignment-invariant (top-k tie ORDER is not, since the
        # two indexes number docs differently)
        hits = s.search(qtext, k=1000)
        um = pd.read_parquet(os.path.join(index_dir, "urlmap"))
        m = dict(zip(um.doc_id, um.url))
        return sorted((m[d], round(sc, 9)) for d, sc in hits)

    for q in ("spark join", "number44", "fast"):
        assert urls_for(idx, q) == urls_for(full, q), q
