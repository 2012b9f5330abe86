#!/usr/bin/env python
"""CLI: query a built index.

    python query.py --index-dir /data/index "spark join" -k 10
    python query.py --index-dir /data/index --distributed "spark join"

Default is the local block-max WAND path (millisecond latency, no
Spark job); --distributed runs the Spark IndexReader plan (same
results, cluster-scale).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    import os
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument("qtext")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--mode", choices=["and", "or"], default="and",
                    help="and = posting-list intersection (reference "
                         "semantics); or = disjunctive BM25 (block-max "
                         "pruned on the local path too)")
    ap.add_argument("--urls", action="store_true",
                    help="print urls (requires an index built from "
                         "pages input — urlmap table present)")
    args = ap.parse_args()

    if not os.path.isdir(args.index_dir) or not os.path.isdir(
        os.path.join(args.index_dir, "postings")
    ):
        ap.error(f"--index-dir {args.index_dir!r} is not a built index "
                 "(no postings/ table) — build one with build_index.py")
    stem = not args.no_stem
    t0 = time.time()
    if args.distributed:
        from search_engine_spark.plans.index_query import IndexReader
        from search_engine_spark.session import get_spark

        spark = get_spark("query")
        hits = [
            (r.doc_id, r.score)
            for r in IndexReader(spark, args.index_dir)
            .search(args.qtext, k=args.k, stem=stem, mode=args.mode).collect()
        ]
        spark.stop()
    else:
        from search_engine_spark.plans.wand import LocalSearcher

        hits = LocalSearcher(args.index_dir).search(
            args.qtext, k=args.k, stem=stem, mode=args.mode
        )
    wall = time.time() - t0
    urls = {}
    if args.urls and hits:
        urlmap = os.path.join(args.index_dir, "urlmap")
        if not os.path.isdir(urlmap):
            ap.error("--urls needs the index's urlmap table (built from "
                     "pages input)")
        import pyarrow.dataset as ds

        ids = [int(d) for d, _ in hits]
        tbl = ds.dataset(urlmap, format="parquet").to_table(
            columns=["doc_id", "url"],
            filter=ds.field("doc_id").isin(ids),  # row-group pruned
        )
        urls = dict(zip(tbl["doc_id"].to_pylist(), tbl["url"].to_pylist()))
    for rank, (doc_id, score) in enumerate(hits, 1):
        tail = f"\t{urls.get(doc_id, '?')}" if args.urls else ""
        print(f"{rank}\t{doc_id}\t{score:.6f}{tail}")
    print(json.dumps({"n": len(hits), "wall_s": round(wall, 4)}))


if __name__ == "__main__":
    main()
