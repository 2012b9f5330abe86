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
                         "semantics); or = disjunctive BM25 (distributed "
                         "path only)")
    args = ap.parse_args()

    if not os.path.isdir(args.index_dir) or not os.path.isdir(
        os.path.join(args.index_dir, "postings")
    ):
        ap.error(f"--index-dir {args.index_dir!r} is not a built index "
                 "(no postings/ table) — build one with build_index.py")
    if args.mode == "or" and not args.distributed:
        ap.error("--mode or requires --distributed (the local WAND path "
                 "implements the reference's conjunctive semantics)")

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

        hits = LocalSearcher(args.index_dir).search(args.qtext, k=args.k, stem=stem)
    wall = time.time() - t0
    for rank, (doc_id, score) in enumerate(hits, 1):
        print(f"{rank}\t{doc_id}\t{score:.6f}")
    print(json.dumps({"n": len(hits), "wall_s": round(wall, 4)}))


if __name__ == "__main__":
    main()
