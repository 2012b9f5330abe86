#!/usr/bin/env python
"""CLI: build the inverted index (cluster launch path).

    spark-submit --py-files engine.zip build_index.py \
        --input /data/pages --input-format pages \
        --index-dir /data/index --n-buckets 4096 [--resume]

On a cluster, executors come from spark-submit; locally the session
factory uses local[$SPARK_GRAFT_CPUS]. Matches BASELINE.json
north_rule: "run via spark-submit --py-files on a multi-executor
cluster". Package the engine with:

    cd /root/repo && zip -r engine.zip search_engine_spark
"""

from __future__ import annotations

import argparse
import json
import time


def _bigram_meta(index_dir: str) -> dict:
    import json as _json
    import os as _os

    with open(_os.path.join(index_dir, "bigrams_meta.json")) as f:
        return _json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path (pages or documents shape)")
    ap.add_argument("--input-format", choices=["pages", "documents"], default="pages")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--segment-size", type=int, default=4096)
    ap.add_argument("--salt-threshold", type=int, default=1_000_000)
    ap.add_argument("--max-salts", type=int, default=32)
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--lang", default=None, help="optional lang filter, e.g. en")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--extend", action="store_true",
                    help="append --input's docs to an EXISTING index "
                         "(converges to a full rebuild over the union)")
    ap.add_argument("--update", action="store_true",
                    help="with --extend (pages format): re-crawled urls "
                         "whose warc_ts is NEWER than the indexed "
                         "snapshot replace it — the old doc_id is "
                         "tombstoned (plans/deletes) and the new "
                         "snapshot indexed under a fresh id; compact "
                         "later to reclaim space")
    ap.add_argument("--positions", action="store_true",
                    help="also build the positional postings table "
                         "(enables exact-phrase queries: query.py "
                         "--phrase). Roughly doubles index size — the "
                         "canonical positional-index cost")
    ap.add_argument("--bigrams", type=int, default=None, metavar="B",
                    help="also build the phrase-acceleration bigram "
                         "table (nextword index): adjacency-count "
                         "postings for every token pair touching one "
                         "of the top-B df terms — the worst-case "
                         "stopword phrase becomes a direct posting "
                         "read instead of a positional verify scan")
    ap.add_argument("--title-index", action="store_true",
                    help="also index the <title> field as a second "
                         "index under fields/title (pages input; "
                         "enables query.py --title-weight multi-field "
                         "ranking)")
    ap.add_argument("--store-text", action="store_true",
                    help="also persist a doc_id-sorted stored-field "
                         "table (docstore) so query.py --snippets can "
                         "render result snippets without the corpus")
    args = ap.parse_args()

    import os

    if not os.path.exists(args.input):
        ap.error(f"--input {args.input!r} does not exist")

    from pyspark.sql import functions as F

    from search_engine_spark.operators.dedup import latest_snapshot
    from search_engine_spark.operators.ids import assign_dense_ids
    from search_engine_spark.plans.build_index import build_index
    from search_engine_spark.session import get_spark

    spark = get_spark("build-index")
    src = spark.read.parquet(args.input)
    html_col = None
    urlmap_path = os.path.join(args.index_dir, "urlmap")
    if args.input_format == "pages":
        if args.lang:
            src = src.filter(F.col("lang") == args.lang)  # pushed-down predicate
        src = latest_snapshot(src, "url", "warc_ts")
        if args.extend:
            existing = spark.read.parquet(urlmap_path)
            if args.update:
                # re-crawl update = tombstone the indexed snapshot's
                # doc_id + index the new snapshot as a new doc. The
                # old postings stay on disk (masked at query time)
                # until compaction — the standard segment-file update
                # story. Ties (warc_ts not strictly newer) are treated
                # as already-indexed and dropped.
                from search_engine_spark.plans.deletes import (
                    delete_docs, tombstones_df,
                )

                # urlmap keeps superseded rows until compaction, so
                # restrict the update join to LIVE rows: anti-join the
                # tombstone set, then reduce to the newest live
                # snapshot per url (struct-max on (warc_ts, doc_id)).
                # Without this, a second --update run (or a url
                # updated twice between compactions) matches the stale
                # tombstoned row, re-tombstones it, and indexes a
                # DUPLICATE live copy — the operation must be
                # idempotent.
                tomb = tombstones_df(spark, args.index_dir)
                live = existing if tomb is None else existing.join(
                    tomb, "doc_id", "left_anti"
                )
                old = (
                    live.groupBy("url")
                    .agg(F.max(F.struct("warc_ts", "doc_id")).alias("_s"))
                    .select(
                        "url",
                        F.col("_s.doc_id").alias("_old_id"),
                        F.col("_s.warc_ts").alias("_old_ts"),
                    )
                )
                # eager localCheckpoints: every write below (tombstone
                # append, urlmap append) invalidates Spark's
                # file-listing cache for the tables these plans read,
                # so a later re-evaluation would see its OWN output
                # and silently change the batch (observed: the title/
                # positions extension re-filtering against the
                # just-appended urlmap and becoming a no-op). Pin the
                # batch BEFORE the first write; the re-crawl batch is
                # small relative to the corpus, so the executor-local
                # persist is cheap.
                updated = (
                    src.join(old, "url")
                    .filter(F.col("warc_ts") > F.col("_old_ts"))
                ).localCheckpoint()
                # a url whose every row is tombstoned counts as absent
                # — a re-crawl of a deleted page re-enters as fresh
                fresh = src.join(live.select("url"), "url", "left_anti")
                # belt-and-braces: src rows are unique per url, so the
                # union can only collide if the pinned views above
                # ever drift — never index one url twice in a batch
                src = fresh.unionByName(
                    updated.drop("_old_id", "_old_ts")
                ).dropDuplicates(["url"])
                # tombstoning is DEFERRED until the whole batch is
                # pinned below: a crash between the two leaves
                # tombstones without replacements, and the re-run
                # self-heals (fully-dead urls re-enter as fresh)
                dead_ids = updated.select(F.col("_old_id").alias("doc_id"))
            else:
                # append-only extension: genuinely new urls only
                src = src.join(existing.select("url"), "url", "left_anti")
            # new docs continue the dense id space after existing ones.
            # Offset by max(doc_id)+1 from urlmap — NOT meta['n_docs']:
            # n_docs counts docs with >=1 posting (empty docs are
            # dropped from the flat table by the P4 filter), so it can
            # be SMALLER than the allocated id range and overlapping
            # ids would corrupt the merge with duplicate (term, doc_id)
            # postings.
            max_id = existing.agg(F.max("doc_id")).collect()[0][0]
            offset = int(max_id) + 1 if max_id is not None else 0
            # PIN the batch before any index write: the body extend
            # appends to urlmap/deletes, which invalidates the file-
            # listing cache behind `existing`/`tomb` — without the
            # eager checkpoint, the positions/title extensions that
            # re-evaluate `src` afterwards would anti-join against
            # their own output and silently ingest nothing.
            src = assign_dense_ids(src, "url").withColumn(
                "doc_id", F.col("doc_id") + F.lit(offset)
            ).localCheckpoint()
            if args.update:
                n_upd = delete_docs(spark, args.index_dir, dead_ids)[
                    "tombstones_appended"
                ]
                print(json.dumps({"urls_updated": n_upd}))
        else:
            src = assign_dense_ids(src, "url")
        html_col = "html"

    t0 = time.time()
    if args.extend:
        from search_engine_spark.plans.build_index import extend_index

        summary = extend_index(
            spark, src, args.index_dir,
            segment_size=args.segment_size, stem=not args.no_stem,
            html_col=html_col, max_salts=args.max_salts,
        )
    else:
        summary = build_index(
            spark, src, args.index_dir,
            n_buckets=args.n_buckets, segment_size=args.segment_size,
            stem=not args.no_stem, html_col=html_col,
            salt_threshold=args.salt_threshold, max_salts=args.max_salts,
            resume=args.resume,
        )
    if args.input_format == "pages":
        # doc_id <-> url map (S5: ranked output is urls); doc_id-sorted
        # so query-time id lookups prune parquet row groups
        (
            src.select("doc_id", "url", "warc_ts")
            .sort("doc_id")
            .write.mode("append" if args.extend else "overwrite")
            .parquet(urlmap_path)
        )
    if args.positions or (
        args.extend
        and os.path.exists(
            os.path.join(args.index_dir, "positions_meta.json")
        )
    ):
        # auto-extend whenever the table exists, even without
        # --positions — same contract as the bigram table below: a
        # stale positional table would silently miss new docs'
        # phrases (and fsck I7 flags exactly that tf-without-npos
        # divergence; found by the generationed --extend verify drive)
        from search_engine_spark.plans.positions import build_positions

        if args.extend:
            # append-in-kind: src is already the genuinely-new docs
            # (left-anti url join above) with fresh dense ids; rows
            # are per (term, doc), so the union table == a rebuild.
            # n_buckets/stem are validated against positions_meta.
            import json as _json

            pmeta_path = os.path.join(args.index_dir, "positions_meta.json")
            if not os.path.exists(pmeta_path):
                ap.error("--positions --extend needs an existing "
                         "positional table — run a full build with "
                         "--positions first")
            with open(pmeta_path) as f:
                pmeta = _json.load(f)
            build_positions(
                spark, src, args.index_dir,
                n_buckets=int(pmeta["n_buckets"]),
                stem=bool(pmeta["stem"]), html_col=html_col, mode="append",
            )
        else:
            build_positions(
                spark, src, args.index_dir, n_buckets=args.n_buckets,
                stem=not args.no_stem, html_col=html_col,
            )
        summary["positions_built"] = True
    if args.bigrams is not None or (
        args.extend
        and os.path.exists(
            os.path.join(args.index_dir, "bigrams_meta.json")
        )
    ):
        from search_engine_spark.plans.bigrams import build_bigrams

        if args.extend:
            # append-in-kind, same contract as the positional table:
            # src is the genuinely-new docs with fresh ids; the frozen
            # hot list / n_buckets / stem come from bigrams_meta (the
            # indexed-pair set is a physical invariant). Auto-extends
            # whenever the table exists, even without --bigrams — a
            # stale acceleration table would silently miss new docs'
            # phrases.
            bmeta_path = os.path.join(args.index_dir, "bigrams_meta.json")
            if not os.path.exists(bmeta_path):
                ap.error("--bigrams --extend needs an existing bigram "
                         "table — run a full build with --bigrams first")
            build_bigrams(
                spark, src, args.index_dir, html_col=html_col,
                mode="append",
                # n_buckets/stem/hot are read from the meta in append
                # mode; pass the meta's values to satisfy validation
                **{k: v for k, v in _bigram_meta(args.index_dir).items()
                   if k in ("n_buckets", "stem")},
            )
        else:
            build_bigrams(
                spark, src, args.index_dir, n_buckets=args.n_buckets,
                stem=not args.no_stem, top_terms=args.bigrams,
                html_col=html_col,
            )
        summary["bigrams_built"] = True
    if args.title_index or (
        args.extend
        and os.path.isdir(
            os.path.join(args.index_dir, "fields", "title", "postings")
        )
    ):
        # auto-extend the title field whenever it exists — a stale
        # field index would rank new docs by body only (same staleness
        # contract as positions/bigrams above)
        if args.input_format != "pages":
            ap.error("--title-index needs pages input (html column)")
        if args.extend:
            # src already carries the genuinely-new docs with fresh
            # offset ids (and the re-crawled snapshots under --update).
            # Re-crawled docs' OLD title postings are masked because
            # fields/title shares the parent's doc_id space and its
            # tombstone table: the field searcher falls back to
            # <index>/deletes (plans/deletes._field_parent) since
            # delete_docs never writes a fields/title/deletes dir.
            from search_engine_spark.plans.multifield import (
                extend_title_index,
            )

            extend_title_index(
                spark, src, args.index_dir, stem=not args.no_stem,
            )
        else:
            from search_engine_spark.plans.multifield import (
                build_title_index,
            )

            build_title_index(
                spark, src, args.index_dir,
                n_buckets=args.n_buckets, stem=not args.no_stem,
            )
        summary["title_index_built"] = True
    if args.store_text or (
        args.extend
        and os.path.isdir(os.path.join(args.index_dir, "docstore"))
    ):
        # auto-extend the docstore too: a stale one would 404 snippet
        # fetches for every new doc
        from search_engine_spark.plans.docstore import build_docstore

        # pages-format text == extract_text(html) (generator invariant;
        # tests/test_pages.py) — stored as-is so snippet tokenization
        # matches the indexed tokens exactly
        build_docstore(
            spark, src, args.index_dir,
            mode="append" if args.extend else "overwrite",
        )
        summary["docstore_built"] = True
    summary["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
