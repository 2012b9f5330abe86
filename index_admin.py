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
import time


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

    args = ap.parse_args()

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
    else:
        from search_engine_spark.plans.deletes import compact_index

        summary = compact_index(
            spark, args.index_dir,
            segment_size=args.segment_size, max_salts=args.max_salts,
        )
    summary["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
