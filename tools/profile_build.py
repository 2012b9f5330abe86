#!/usr/bin/env python
"""Per-phase scaling profile of the index build (verdict r4 item #1).

Runs the EXACT bench build job (same corpus synthesis, same knobs as
bench.py build_at) at each core level in --cores, reporting per-phase
wall times and per-phase N->4N efficiency so the bytes/doc work can be
aimed at the phase that actually loses at 4c.

Usage:
    python tools/profile_build.py [--docs 120000] [--cores 1,4] \
        [--repeats 1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def materialize(corpus_dir: str, docs: int, cpus: int) -> None:
    from search_engine_spark.operators.dedup import latest_snapshot
    from search_engine_spark.operators.ids import assign_dense_ids
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.pages import generate_pages

    spark = get_spark("profile-gen", cores=cpus, shuffle_partitions=128)
    try:
        pages = generate_pages(spark, docs, partitions=256)
        src = assign_dense_ids(latest_snapshot(pages, "url", "warc_ts"), "url")
        src.write.mode("overwrite").parquet(corpus_dir)
    finally:
        spark.stop()


def build_at(cores: int, corpus_dir: str, out_dir: str, docs: int) -> dict:
    from search_engine_spark.operators.aggregates import postings_from_text
    from search_engine_spark.plans.build_index import build_index
    from search_engine_spark.session import get_spark

    spark = get_spark(f"profile-build-{cores}", cores=cores,
                      shuffle_partitions=128)
    try:
        src = spark.read.parquet(corpus_dir)
        postings_from_text(src.limit(2000), html_col="html").count()  # warm
        timings: dict = {}
        t0 = time.time()
        build_index(
            spark, src, out_dir, n_buckets=64,
            segment_size=4096, stem=True, html_col="html",
            salt_threshold=max(docs // 8, 1000), max_salts=16,
            timings=timings,
        )
        timings["total_s"] = round(time.time() - t0, 3)
        return timings
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120_000)
    ap.add_argument("--cores", default="1,4")
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()
    levels = [int(c) for c in args.cores.split(",")]

    work = tempfile.mkdtemp(prefix="profile_build_")
    corpus = os.path.join(work, "corpus")
    try:
        materialize(corpus, args.docs, max(levels))
        results: dict[int, dict] = {}
        for cores in levels:
            runs = []
            for r in range(args.repeats):
                out = os.path.join(work, f"idx_{cores}c_{r}")
                runs.append(build_at(cores, corpus, out, args.docs))
            # median by total; report that run's phase split
            runs.sort(key=lambda t: t["total_s"])
            results[cores] = runs[len(runs) // 2]
            results[cores]["all_totals"] = [t["total_s"] for t in runs]
            print(f"[{cores}c] {json.dumps(results[cores])}", flush=True)
        for lo, hi in ((1, 4), (2, 8), (4, 16), (8, 32)):
            if lo in results and hi in results:
                lo_t, hi_t = results[lo], results[hi]
                eff = {
                    k: round(lo_t[k] / (4.0 * hi_t[k]), 3)
                    for k in lo_t
                    if k.endswith("_s") and k in hi_t and hi_t[k] > 0
                }
                print(f"eff {lo}->{hi}: {json.dumps(eff)}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
