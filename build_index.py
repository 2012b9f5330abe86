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
    if args.input_format == "pages":
        if args.lang:
            src = src.filter(F.col("lang") == args.lang)  # pushed-down predicate
        src = latest_snapshot(src, "url", "warc_ts")
        src = assign_dense_ids(src, "url")
        html_col = "html"

    t0 = time.time()
    summary = build_index(
        spark, src, args.index_dir,
        n_buckets=args.n_buckets, segment_size=args.segment_size,
        stem=not args.no_stem, html_col=html_col,
        salt_threshold=args.salt_threshold, max_salts=args.max_salts,
        resume=args.resume,
    )
    summary["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
