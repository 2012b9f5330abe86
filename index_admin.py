#!/usr/bin/env python
"""CLI: index lifecycle administration (delete / compact).

    # logical delete (cheap, query-time masking takes effect at once)
    python index_admin.py delete --index-dir /data/index --doc-ids 12,99
    python index_admin.py delete --index-dir /data/index --urls-file gone.txt

    # physical delete (rewrites the index minus tombstones; equals a
    # fresh build over the surviving corpus)
    python index_admin.py compact --index-dir /data/index

Cluster launch mirrors build_index.py: spark-submit --py-files
engine.zip index_admin.py ...
"""

from __future__ import annotations

import argparse
import json
import os
import time


def index_stats(index_dir: str) -> dict:
    """Index introspection from parquet FOOTERS + the meta JSON — no
    Spark job, no data read. Row counts and byte totals come from
    file/row-group metadata; per-bucket posting-row totals expose
    residual skew after salting (max/mean bucket ratio)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    out: dict = {"index_dir": index_dir}
    meta_path = os.path.join(index_dir, "index_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out.update(json.load(f))

    def table_stats(name, *, per_bucket=False):
        path = os.path.join(index_dir, name)
        if not os.path.isdir(path):
            return None
        rows = 0
        data_bytes = 0
        n_files = 0
        n_rgs = 0
        buckets: dict[int, int] = {}
        dset = pads.dataset(path, format="parquet", partitioning="hive")
        for frag in dset.get_fragments():
            md = pq.ParquetFile(frag.path).metadata
            rows += md.num_rows
            n_rgs += md.num_row_groups
            n_files += 1
            for rg in range(md.num_row_groups):
                data_bytes += md.row_group(rg).total_byte_size
            if per_bucket and "bucket=" in frag.path:
                b = int(frag.path.split("bucket=")[1].split("/")[0])
                buckets[b] = buckets.get(b, 0) + md.num_rows
        st = {"rows": rows, "data_bytes": data_bytes,
              "files": n_files, "row_groups": n_rgs}
        if per_bucket and buckets:
            vals = sorted(buckets.values())
            mean = sum(vals) / len(vals)
            st["buckets"] = len(buckets)
            st["bucket_rows_max"] = vals[-1]
            st["bucket_skew"] = round(vals[-1] / mean, 3) if mean else None
        return st

    for name, pb in (("postings", True), ("postings_flat", False),
                     ("dictionary", True), ("docs", False),
                     ("urlmap", False), ("positions", True),
                     ("deletes", False), ("manifest", False),
                     ("suggest", False), ("docstore", False),
                     (os.path.join("fields", "title", "postings"), True)):
        st = table_stats(name, per_bucket=pb)
        if st is not None:
            out[name] = st
    if "dictionary" in out:
        out["vocabulary"] = out["dictionary"]["rows"]
    if "postings_flat" in out and out["postings_flat"]["rows"]:
        segs = out.get("postings", {})
        out["bytes_per_posting"] = round(
            segs.get("data_bytes", 0) / out["postings_flat"]["rows"], 3
        )
    if "deletes" in out:
        out["pending_tombstones"] = out["deletes"]["rows"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("delete", help="tombstone documents")
    d.add_argument("--index-dir", required=True)
    d.add_argument("--doc-ids", default=None,
                   help="comma-separated doc_ids to delete")
    d.add_argument("--urls-file", default=None,
                   help="file with one url per line; resolved to doc_ids "
                        "via the index's urlmap")

    c = sub.add_parser("compact", help="apply tombstones physically")
    c.add_argument("--index-dir", required=True)
    c.add_argument("--segment-size", type=int, default=4096)
    c.add_argument("--max-salts", type=int, default=32)
    c.add_argument("--generations", action="store_true",
                   help="run inside a whole-index generation "
                        "transaction: one atomic symlink swap commits "
                        "every table together (concurrent readers see "
                        "old-or-new, never mixed). Auto-enabled once "
                        "the index is generation-managed")

    s = sub.add_parser("stats", help="index introspection (no Spark job)")
    s.add_argument("--index-dir", required=True)

    k = sub.add_parser("fsck",
                       help="decode-level integrity checks (df "
                            "consistency, duplicate postings, segment "
                            "order, bucket routing, tombstone "
                            "referents, positions/tf agreement) — "
                            "no Spark job; exit 1 on corruption")
    k.add_argument("--index-dir", required=True)
    k.add_argument("--sample", type=int, default=200,
                   help="terms to check (highest-df always included)")
    k.add_argument("--distributed", action="store_true",
                   help="full-coverage Spark job: EVERY term and "
                        "posting verified (the post-migration audit; "
                        "the default sampled probe is the cheap one)")

    g = sub.add_parser("build-suggest",
                       help="derive the SymSpell-style spelling-"
                            "suggestion table from the dictionary "
                            "(enables query.py --suggest)")
    g.add_argument("--index-dir", required=True)

    m = sub.add_parser("merge",
                       help="tiered merge: fold two BUILT indexes "
                            "into one without re-tokenizing (the "
                            "parallel-shard ingest path; converges "
                            "to a fresh build over the union corpus). "
                            "Default is the O(incoming) segment-append "
                            "(copy a, append b); --rebuild re-segments "
                            "the union for the canonical layout")
    m.add_argument("--index-a", required=True)
    m.add_argument("--index-b", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--rebuild", action="store_true",
                   help="O(total) canonicalizing merge (forceMerge-"
                        "style): packed segments, tight bounds")
    m.add_argument("--segment-size", type=int, default=4096)
    m.add_argument("--max-salts", type=int, default=32)

    mi = sub.add_parser("merge-into",
                        help="fold a built index INTO the target in "
                             "place — O(incoming): the LSM ingest "
                             "cadence (nightly shard folds)")
    mi.add_argument("--index-dir", required=True,
                    help="target index (modified in place)")
    mi.add_argument("--incoming", required=True)
    mi.add_argument("--generations", action="store_true",
                    help="commit the fold as one whole-index "
                         "generation (see compact --generations)")
    mi.add_argument("--rebuild-suggest", action="store_true",
                    help="rebuild the SymSpell suggestion table after "
                         "the fold when the target serves one (it "
                         "derives from dictionary dfs, which the fold "
                         "changes — otherwise the summary reports "
                         "suggest_stale: true)")

    fo = sub.add_parser("fold",
                        help="fold every pending streaming epoch shard "
                             "(streaming/incremental.start_shard_ingest "
                             "output) into the serving index, in epoch "
                             "order — O(epoch) each, ledger-idempotent; "
                             "unfolded shards stay searchable meanwhile "
                             "via query.py --also")
    fo.add_argument("--index-dir", required=True,
                    help="serving index (bootstrapped from the first "
                         "epoch if missing)")
    fo.add_argument("--shards-dir", required=True)
    fo.add_argument("--rebuild-suggest", action="store_true",
                    help="rebuild the SymSpell suggestion table after "
                         "folding when the target serves one (the fold "
                         "changes dictionary dfs; otherwise the "
                         "summary reports suggest_stale: true)")

    pr = sub.add_parser("pagerank",
                        help="compute PageRank over a (src, dst) edge "
                             "table and write it as the index's static "
                             "boost table (<index>/boosts) — serving "
                             "adds boost(doc) to every BM25 score "
                             "(query.py picks it up automatically)")
    pr.add_argument("--index-dir", required=True)
    pr.add_argument("--edges", default=None,
                    help="parquet with (src, dst) doc_id edges; pass "
                         "'synthetic' to derive the deterministic test "
                         "graph from the index's doc_id space")
    pr.add_argument("--pages", default=None,
                    help="pages-shaped parquet: extract <a href> edges "
                         "from the html column and resolve them through "
                         "the index's urlmap (the real web-graph path; "
                         "re-crawl dups deduped to the latest snapshot)")
    pr.add_argument("--iters", type=int, default=5)
    pr.add_argument("--damping", type=float, default=0.85)
    pr.add_argument("--weight", type=float, default=2.0,
                    help="boost = weight * ln(1 + n_docs * rank)")

    ba = sub.add_parser("build-anchor",
                        help="build the inbound-anchor-text field index "
                             "(fields/anchor) from a pages parquet: "
                             "<a href> display text, resolved to link "
                             "TARGETS through the index's urlmap — the "
                             "third web-ranking field next to body and "
                             "title (query.py --anchor-weight)")
    ba.add_argument("--index-dir", required=True)
    ba.add_argument("--pages", required=True,
                    help="pages-shaped parquet (url, warc_ts, html)")
    ba.add_argument("--buckets", type=int, default=8)
    ba.add_argument("--segment-size", type=int, default=4096)
    ba.add_argument("--no-stem", action="store_true")
    ba.add_argument("--max-anchors-per-doc", type=int, default=1024)

    bb = sub.add_parser("build-bigrams",
                        help="build the phrase-acceleration bigram "
                             "table (nextword index) for an EXISTING "
                             "index: adjacency-count postings for "
                             "token pairs touching a top-B df term — "
                             "query.py --phrase picks it up "
                             "automatically (stopword phrases become "
                             "direct posting reads)")
    bb.add_argument("--index-dir", required=True)
    bb.add_argument("--input", required=True,
                    help="the indexed corpus parquet (pages shape; "
                         "doc_ids resolve through the index's urlmap)")
    bb.add_argument("--buckets", type=int, default=8)
    bb.add_argument("--top-terms", type=int, default=32)

    lb = sub.add_parser("learn-bpe",
                        help="learn a BPE merge table from a corpus "
                             "(Sennrich subword units): distributed "
                             "pretoken word-count aggregation, then a "
                             "bounded merge loop over the top-V words "
                             "— writes merges JSON for apply-bpe")
    lb.add_argument("--input", required=True,
                    help="corpus parquet with a text column")
    lb.add_argument("--out", required=True, help="merges JSON path")
    lb.add_argument("--text-col", default="text")
    lb.add_argument("--n-merges", type=int, default=1000)
    lb.add_argument("--max-words", type=int, default=65536)
    lb.add_argument("--min-count", type=int, default=2)

    ab = sub.add_parser("apply-bpe",
                        help="encode a corpus with a learned merge "
                             "table: writes (doc_id, n_bpe_tokens) "
                             "parquet (Arrow-batched kernel, word-"
                             "memoized)")
    ab.add_argument("--input", required=True)
    ab.add_argument("--merges", required=True, help="learn-bpe output")
    ab.add_argument("--out", required=True, help="output parquet dir")
    ab.add_argument("--text-col", default="text")
    ab.add_argument("--id-col", default="doc_id")

    tb = sub.add_parser("tune-blend",
                        help="grid-search a linear score blend "
                             "(base_score + w*boost) against graded "
                             "judgments in ONE job: prints macro "
                             "nDCG@k per weight, best first")
    tb.add_argument("--candidates", required=True,
                    help="parquet (query_id, doc_id, base_score, "
                         "boost) — first-stage top-N per query")
    tb.add_argument("--qrels", required=True,
                    help="parquet (query_id, doc_id, rel)")
    tb.add_argument("--weights", default="0,0.25,0.5,1,2,4",
                    help="comma-separated grid")
    tb.add_argument("-k", type=int, default=10)
    tb.add_argument("--metric", default="ndcg",
                    choices=["ndcg", "mrr", "recall", "ap"],
                    help="macro-averaged metric the grid optimizes")

    sb = sub.add_parser("set-boosts",
                        help="install an arbitrary (doc_id, boost) "
                             "parquet as the index's static boost "
                             "table (boosts must be >= 0)")
    sb.add_argument("--index-dir", required=True)
    sb.add_argument("--boosts", required=True, help="source parquet path")

    args = ap.parse_args()

    if args.cmd == "stats":
        # pure pyarrow-footer walk — works without a SparkSession, so
        # it is safe to run against a live index from an ops shell
        print(json.dumps(index_stats(args.index_dir)))
        return
    if args.cmd == "fsck" and not args.distributed:
        from search_engine_spark.plans.fsck import fsck

        out = fsck(args.index_dir, sample_terms=args.sample)
        print(json.dumps(out))
        raise SystemExit(0 if out["ok"] else 1)

    from search_engine_spark.session import get_spark

    spark = get_spark("index-admin")
    t0 = time.time()
    if args.cmd == "delete":
        from pyspark.sql import functions as F

        from search_engine_spark.plans.deletes import delete_docs

        if bool(args.doc_ids) == bool(args.urls_file):
            ap.error("provide exactly one of --doc-ids / --urls-file")
        if args.doc_ids:
            ids = [int(x) for x in args.doc_ids.split(",") if x.strip()]
            summary = delete_docs(spark, args.index_dir, ids)
        else:
            import os

            with open(args.urls_file) as f:
                urls = [ln.strip() for ln in f if ln.strip()]
            urlmap = spark.read.parquet(
                os.path.join(args.index_dir, "urlmap")
            )
            url_df = spark.createDataFrame(
                [(u,) for u in urls], "url string"
            )
            ids_df = urlmap.join(F.broadcast(url_df), "url").select("doc_id")
            summary = delete_docs(spark, args.index_dir, ids_df)
    elif args.cmd == "build-suggest":
        from search_engine_spark.plans.suggest import build_suggest

        summary = build_suggest(spark, args.index_dir)
    elif args.cmd == "fsck":
        from search_engine_spark.plans.fsck import fsck_distributed

        summary = fsck_distributed(spark, args.index_dir)
    elif args.cmd == "merge":
        from search_engine_spark.plans.merge import merge_indexes

        summary = merge_indexes(
            spark, args.index_a, args.index_b, args.out,
            segment_size=args.segment_size, max_salts=args.max_salts,
            rebuild=args.rebuild,
        )
    elif args.cmd == "merge-into":
        from search_engine_spark.plans.merge import merge_into

        summary = merge_into(spark, args.index_dir, args.incoming,
                             generations=True if args.generations
                             else None)
        if summary.get("suggest_stale") and args.rebuild_suggest:
            from search_engine_spark.plans.suggest import build_suggest

            summary["suggest_rebuilt"] = build_suggest(
                spark, args.index_dir
            )["suggest_rows"]
            summary["suggest_stale"] = False
    elif args.cmd == "fold":
        from search_engine_spark.streaming.incremental import fold_shards

        summary = fold_shards(spark, args.shards_dir, args.index_dir)
        if summary.get("suggest_stale") and args.rebuild_suggest:
            from search_engine_spark.plans.suggest import build_suggest

            summary["suggest_rebuilt"] = build_suggest(
                spark, args.index_dir
            )["suggest_rows"]
            summary["suggest_stale"] = False
    elif args.cmd == "pagerank":
        import os

        from pyspark.sql import functions as F

        from search_engine_spark.operators.graph import (
            extract_link_edges, pagerank, pagerank_boosts,
            synthetic_link_graph,
        )

        if bool(args.edges) == bool(args.pages):
            raise SystemExit(
                "provide exactly one of --edges / --pages"
            )
        stats = spark.read.parquet(os.path.join(args.index_dir, "stats"))
        n_docs = int(stats.collect()[0]["n_docs"])
        nodes = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        if args.pages:
            from search_engine_spark.operators.dedup import latest_snapshot

            urlmap_dir = os.path.join(args.index_dir, "urlmap")
            if not os.path.isdir(urlmap_dir):
                raise SystemExit(
                    "--pages needs the index's urlmap table (built "
                    "from pages input)"
                )
            pages = latest_snapshot(
                spark.read.parquet(args.pages), "url", "warc_ts"
            )
            edges = extract_link_edges(
                pages, spark.read.parquet(urlmap_dir)
            )
        elif args.edges == "synthetic":
            edges = synthetic_link_graph(nodes, n_docs=n_docs)
        else:
            edges = spark.read.parquet(args.edges).select("src", "dst")
        ranks = pagerank(nodes, edges, n_docs=n_docs, iters=args.iters,
                         damping=args.damping)
        boosts = pagerank_boosts(ranks, n_docs=n_docs, weight=args.weight)
        from search_engine_spark.plans.publish import publish_dir

        # keep only strictly-positive boosts: absent == 0.0 on the
        # serving side, and a smaller table broadcasts cheaper;
        # atomic publish — the index keeps serving during the install
        publish_dir(
            os.path.join(args.index_dir, "boosts"),
            lambda tmp: boosts.filter(F.col("boost") > 0.0)
            .sort("doc_id")
            .write.mode("overwrite")
            .parquet(tmp),
            suffix=".install",
        )
        summary = {"ok": True, "n_docs": n_docs, "iters": args.iters,
                   "weight": args.weight,
                   "boosts": os.path.join(args.index_dir, "boosts")}
    elif args.cmd == "build-anchor":
        import os

        from search_engine_spark.plans.multifield import build_anchor_index

        # default the analyzer to the BODY index's stem setting so one
        # analyze_query term set hits both fields; --no-stem overrides
        stem = not args.no_stem
        meta_path = os.path.join(args.index_dir, "index_meta.json")
        if not args.no_stem and os.path.exists(meta_path):
            with open(meta_path) as f:
                stem = bool(json.load(f).get("stem", True))
        summary = build_anchor_index(
            spark, spark.read.parquet(args.pages), args.index_dir,
            n_buckets=args.buckets, segment_size=args.segment_size,
            stem=stem, max_anchors_per_doc=args.max_anchors_per_doc,
        )
        summary["field"] = "anchor"
    elif args.cmd == "build-bigrams":
        import os

        from search_engine_spark.operators.dedup import latest_snapshot
        from search_engine_spark.plans.bigrams import build_bigrams

        urlmap_dir = os.path.join(args.index_dir, "urlmap")
        if not os.path.isdir(urlmap_dir):
            raise SystemExit(
                "build-bigrams needs the index's urlmap table (index "
                "built from pages input)"
            )
        with open(os.path.join(args.index_dir, "index_meta.json")) as f:
            stem = bool(json.load(f).get("stem", True))
        pages = latest_snapshot(
            spark.read.parquet(args.input), "url", "warc_ts"
        )
        # doc_ids come from the urlmap join — identical id space to
        # the index; urls crawled after the build simply drop out
        src = pages.join(
            spark.read.parquet(urlmap_dir).select("url", "doc_id"), "url"
        ).select("doc_id", "text", "html")
        out = build_bigrams(
            spark, src, args.index_dir, n_buckets=args.buckets,
            stem=stem, top_terms=args.top_terms, html_col="html",
        )
        summary = {"ok": True, "bigrams": out,
                   "top_terms": args.top_terms}
    elif args.cmd == "tune-blend":
        from search_engine_spark.operators.ireval import tune_blend

        weights = [float(w) for w in args.weights.split(",") if w.strip()]
        rows = tune_blend(
            spark.read.parquet(args.candidates),
            spark.read.parquet(args.qrels),
            weights, k=args.k, metric=args.metric,
        ).collect()
        mean_key = f"mean_{args.metric}"
        summary = {
            "ok": True,
            "k": args.k,
            "metric": args.metric,
            "grid": [
                {"w": r["w"], "n_queries": r["n_queries"],
                 mean_key: r[mean_key]}
                for r in rows
            ],
            "best_w": rows[0]["w"] if rows else None,
        }
    elif args.cmd == "learn-bpe":
        from search_engine_spark.operators.bpe import learn_bpe

        merges = learn_bpe(
            spark.read.parquet(args.input), args.n_merges,
            text_col=args.text_col, max_words=args.max_words,
            min_count=args.min_count,
        )
        with open(args.out, "w") as f:
            json.dump({
                "merges": [list(p) for p in merges],
                "n_merges": len(merges),
                "max_words": args.max_words,
                "min_count": args.min_count,
                "text_col": args.text_col,
            }, f)
        summary = {"ok": True, "n_merges": len(merges), "out": args.out}
    elif args.cmd == "apply-bpe":
        from search_engine_spark.operators.bpe import apply_bpe

        with open(args.merges) as f:
            merges = [tuple(p) for p in json.load(f)["merges"]]
        out_df = apply_bpe(
            spark.read.parquet(args.input), merges,
            id_col=args.id_col, text_col=args.text_col,
        )
        out_df.write.mode("overwrite").parquet(args.out)
        import pyarrow.dataset as ds

        n = ds.dataset(args.out).count_rows()
        summary = {"ok": True, "n_docs": int(n),
                   "n_merges": len(merges), "out": args.out}
    elif args.cmd == "set-boosts":
        import os

        from pyspark.sql import functions as F

        b = spark.read.parquet(args.boosts).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("boost").cast("double").alias("boost"),
        )
        n_bad = b.filter(
            F.col("boost") < 0.0
        ).limit(1).count()
        if n_bad:
            raise SystemExit(
                "negative boost values — additive static boosts must "
                "be >= 0 (block-max bounds assume it)"
            )
        from search_engine_spark.plans.publish import publish_dir

        publish_dir(
            os.path.join(args.index_dir, "boosts"),
            lambda tmp: b.sort("doc_id").write.mode("overwrite")
            .parquet(tmp),
            suffix=".install",
        )
        summary = {"ok": True,
                   "boosts": os.path.join(args.index_dir, "boosts")}
    else:
        from search_engine_spark.plans.deletes import compact_index

        summary = compact_index(
            spark, args.index_dir,
            segment_size=args.segment_size, max_salts=args.max_salts,
            generations=True if args.generations else None,
        )
    summary["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    spark.stop()
    if not summary.get("ok", True):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
