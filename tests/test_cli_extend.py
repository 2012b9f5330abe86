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


def test_cli_extend_update_recrawl(spark, tmp_path):
    """--extend --update: re-crawled urls with newer warc_ts REPLACE
    their indexed snapshot (old doc_id tombstoned, new text indexed);
    stale re-crawls (older ts) are dropped; after index_admin.py
    compact, the index equals a fresh build over latest-per-url."""
    first = _pages_pdf(40)
    # re-crawls of urls 10..29: one day newer, changed text
    upd = _pages_pdf(20, start=10)
    upd["warc_ts"] = upd["warc_ts"] + pd.Timedelta(days=1)
    upd["text"] = "recrawled body " + upd["url"].str.split("/p").str[-1]
    upd["html"] = [
        f"<html><body>{t}</body></html>".encode() for t in upd["text"]
    ]
    # a STALE re-crawl of url 5 (older ts) — must be ignored
    stale = _pages_pdf(1, start=5, empty_every=10**9)
    stale["warc_ts"] = stale["warc_ts"] - pd.Timedelta(days=1)
    stale["text"] = "should never be indexed"
    stale["html"] = [b"<html><body>should never be indexed</body></html>"]
    new = _pages_pdf(10, start=40)
    second = pd.concat([upd, stale, new], ignore_index=True)

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
                  "--index-dir", idx, "--n-buckets", "4",
                  "--extend", "--update"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    assert {"urls_updated": 20} in [
        {k: v} for d in lines for k, v in d.items() if k == "urls_updated"
    ]

    from search_engine_spark.plans.wand import LocalSearcher

    # stale snapshot never indexed; updated content immediately visible,
    # old content masked
    assert LocalSearcher(idx).search("recrawled body", k=50)
    assert not LocalSearcher(idx).search("never", k=10)
    old10 = LocalSearcher(idx).search("number10", k=10)
    assert not old10  # number10 only existed in the replaced snapshot

    r = _run_cli(["index_admin.py", "compact", "--index-dir", idx])
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])[
        "tombstones_applied"] == 20

    # fresh build over the union corpus (latest_snapshot picks the
    # same winners) must answer identically by url
    p_union = os.path.join(str(tmp_path), "pages_union")
    spark.createDataFrame(
        pd.concat([first, second], ignore_index=True)
    ).write.parquet(p_union)
    r = _run_cli(["build_index.py", "--input", p_union,
                  "--input-format", "pages", "--index-dir", full,
                  "--n-buckets", "4"])
    assert r.returncode == 0, r.stderr[-2000:]

    def urls_for(index_dir, qtext):
        s = LocalSearcher(index_dir)
        hits = s.search(qtext, k=1000)
        um = pd.read_parquet(os.path.join(index_dir, "urlmap"))
        m = dict(zip(um.doc_id, um.url))
        return sorted((m[d], round(sc, 9)) for d, sc in hits)

    for q in ("spark join", "recrawled", "number44", "fast"):
        assert urls_for(idx, q) == urls_for(full, q), q
    # urlmap holds exactly one row per live url after compaction
    um = pd.read_parquet(os.path.join(idx, "urlmap"))
    assert um.url.is_unique


def test_cli_extend_with_title_index(spark, tmp_path):
    """Round 3: --extend --title-index extends fields/title with the
    same new docs (previously a hard CLI error). The extended pair
    must rank identically (by url) to a fresh two-index build over
    the union corpus."""
    first = _pages_pdf(30, empty_every=10**9)
    second = _pages_pdf(45, empty_every=10**9)  # 30 old + 15 new urls
    for pdf in (first, second):
        # give the pages real <title> content so the title field has
        # postings (the shared helper's html is title-less)
        pdf["html"] = [
            (f"<html><head><title>t{u.split('/p')[-1]} spark</title>"
             f"</head><body>{t}</body></html>").encode()
            for u, t in zip(pdf["url"], pdf["text"])
        ]
    p1 = os.path.join(str(tmp_path), "pages1")
    p2 = os.path.join(str(tmp_path), "pages2")
    spark.createDataFrame(first).write.parquet(p1)
    spark.createDataFrame(second).write.parquet(p2)
    idx = os.path.join(str(tmp_path), "idx")
    full = os.path.join(str(tmp_path), "idx_full")

    r = _run_cli(["build_index.py", "--input", p1, "--input-format", "pages",
                  "--index-dir", idx, "--n-buckets", "4", "--title-index"])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli(["build_index.py", "--input", p2, "--input-format", "pages",
                  "--index-dir", idx, "--n-buckets", "4", "--extend",
                  "--title-index"])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli(["build_index.py", "--input", p2, "--input-format", "pages",
                  "--index-dir", full, "--n-buckets", "4", "--title-index"])
    assert r.returncode == 0, r.stderr[-2000:]

    from search_engine_spark.plans.multifield import MultiFieldSearcher

    def urls_for(index_dir, qtext):
        hits = MultiFieldSearcher(index_dir, title_weight=2.0).search(
            qtext, k=1000
        )
        um = pd.read_parquet(os.path.join(index_dir, "urlmap"))
        m = dict(zip(um.doc_id, um.url))
        return sorted((m[d], round(sc, 9)) for d, sc in hits)

    for q in ("spark join", "number40", "fast"):
        assert urls_for(idx, q) == urls_for(full, q), q


def test_cli_extend_with_positions(spark, tmp_path):
    """Round 3: the CLI's --extend --positions path re-evaluated `src`
    AFTER the urlmap append invalidated the file-listing cache, so the
    positional append silently ingested nothing. With the batch
    pinned, extended positions must answer phrases identically (by
    url) to a fresh --positions build over the union."""
    first = _pages_pdf(25, empty_every=10**9)
    second = _pages_pdf(40, empty_every=10**9)
    p1 = os.path.join(str(tmp_path), "pages1")
    p2 = os.path.join(str(tmp_path), "pages2")
    spark.createDataFrame(first).write.parquet(p1)
    spark.createDataFrame(second).write.parquet(p2)
    idx = os.path.join(str(tmp_path), "idx")
    full = os.path.join(str(tmp_path), "idx_full")

    for args in (
        ["--input", p1, "--index-dir", idx, "--positions"],
        ["--input", p2, "--index-dir", idx, "--positions", "--extend"],
        ["--input", p2, "--index-dir", full, "--positions"],
    ):
        r = _run_cli(["build_index.py", "--input-format", "pages",
                      "--n-buckets", "4"] + args)
        assert r.returncode == 0, r.stderr[-2000:]

    from search_engine_spark.plans.positions import PhraseSearcher

    def urls_for(index_dir, phrase):
        hits = PhraseSearcher(index_dir).search_phrase(phrase, k=1000)
        um = pd.read_parquet(os.path.join(index_dir, "urlmap"))
        m = dict(zip(um.doc_id, um.url))
        return sorted((m[d], tf) for d, tf in hits)

    # number35 only exists in the EXTENDED batch — the no-op bug made
    # this come back empty on idx
    got = urls_for(idx, "number35 join")
    assert got and got == urls_for(full, "number35 join")
    assert urls_for(idx, "join fast") == urls_for(full, "join fast")


def test_cli_extend_update_idempotent(spark, tmp_path):
    """Round-3 ADVICE regression: --extend --update must join re-crawls
    against LIVE urlmap rows only. Before the fix, urlmap's stale
    (tombstoned) rows matched too, so (a) re-running the same update
    command re-tombstoned the stale row and indexed a DUPLICATE live
    copy, and (b) a second, newer re-crawl of the same url matched
    both the stale and live rows and doubled the snapshot."""
    first = _pages_pdf(20, empty_every=10**9)
    upd1 = _pages_pdf(5, start=5, empty_every=10**9)
    upd1["warc_ts"] = upd1["warc_ts"] + pd.Timedelta(days=1)
    upd1["text"] = "first recrawl " + upd1["url"].str.split("/p").str[-1]
    upd1["html"] = [
        f"<html><body>{t}</body></html>".encode() for t in upd1["text"]
    ]
    upd2 = _pages_pdf(5, start=5, empty_every=10**9)
    upd2["warc_ts"] = upd2["warc_ts"] + pd.Timedelta(days=2)
    upd2["text"] = "second recrawl " + upd2["url"].str.split("/p").str[-1]
    upd2["html"] = [
        f"<html><body>{t}</body></html>".encode() for t in upd2["text"]
    ]

    p1 = os.path.join(str(tmp_path), "pages1")
    pu1 = os.path.join(str(tmp_path), "pages_u1")
    pu2 = os.path.join(str(tmp_path), "pages_u2")
    spark.createDataFrame(first).write.parquet(p1)
    spark.createDataFrame(upd1).write.parquet(pu1)
    spark.createDataFrame(upd2).write.parquet(pu2)
    idx = os.path.join(str(tmp_path), "idx")

    def updated_count(r):
        lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
        return next(d["urls_updated"] for d in lines if "urls_updated" in d)

    r = _run_cli(["build_index.py", "--input", p1, "--input-format", "pages",
                  "--index-dir", idx, "--n-buckets", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli(["build_index.py", "--input", pu1, "--input-format", "pages",
                  "--index-dir", idx, "--n-buckets", "4",
                  "--extend", "--update"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert updated_count(r) == 5

    # (a) REPLAY the exact same update: live rows carry the same
    # warc_ts now, so nothing is newer -> no-op
    r = _run_cli(["build_index.py", "--input", pu1, "--input-format", "pages",
                  "--index-dir", idx, "--n-buckets", "4",
                  "--extend", "--update"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert updated_count(r) == 0

    # (b) second-generation re-crawl: exactly the 5 live snapshots
    # update (NOT 10 = live + stale matches)
    r = _run_cli(["build_index.py", "--input", pu2, "--input-format", "pages",
                  "--index-dir", idx, "--n-buckets", "4",
                  "--extend", "--update"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert updated_count(r) == 5

    from search_engine_spark.plans.deletes import load_tombstones
    from search_engine_spark.plans.wand import LocalSearcher

    # one LIVE row per url; generation-1 text fully masked
    um = pd.read_parquet(os.path.join(idx, "urlmap"))
    tomb = set(load_tombstones(idx).tolist())
    live = um[~um.doc_id.isin(tomb)]
    assert live.url.is_unique
    assert len(live) == 20
    assert not LocalSearcher(idx).search("first", k=10)
    hits = LocalSearcher(idx).search("second recrawl", k=50)
    assert len(hits) == 5
