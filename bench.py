#!/usr/bin/env python
"""Per-round benchmark (driver contract + BASELINE.md protocol).

Phases:
1. Index build over a deterministic synthetic pages corpus
   (SPARK_GRAFT_BENCH_DOCS, default 60000) at local[$SPARK_GRAFT_CPUS]
   — headline docs/sec.
2. The same build at local[8] — scaling-efficiency stand-in for the
   north_rule's N vs 4N executors (sandbox has one machine; see
   BENCH/BASELINE.md for the protocol note). Efficiency =
   throughput(32) / (4 x throughput(8)) when CPUS=32.
3. Headline driver queries at $SPARK_GRAFT_SF_DIR (default sf0.1).
4. BM25 query latency: distributed IndexReader path (one-shot) and
   local block-max WAND p50 over >=100 repetitions.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
plus extra keys (docs_per_sec_*, scaling_efficiency, wand_p50_ms).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "60000"))
SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"

HEADLINE = [
    "bm25_topk", "bm25_single_term", "term_frequency", "document_frequency",
    "dedup_exact_text", "ann_cosine_topk", "latest_event_per_user",
    "pricing_summary", "revenue_by_nation",
]
WAND_QUERIES = ["the", "spark join", "data filter window", "index search merge"]


def build_at(cores: int, out_dir: str) -> float:
    """Build the synthetic-pages index at a parallelism level; returns
    build wall seconds (excluding session startup)."""
    from search_engine_spark.operators.dedup import latest_snapshot
    from search_engine_spark.operators.ids import assign_dense_ids
    from search_engine_spark.plans.build_index import build_index
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.pages import generate_pages

    spark = get_spark(f"bench-build-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    try:
        pages = generate_pages(spark, BENCH_DOCS, partitions=cores * 4)
        src = assign_dense_ids(latest_snapshot(pages, "url", "warc_ts"), "url")
        t0 = time.time()
        build_index(
            spark, src, out_dir, n_buckets=max(cores * 4, 64),
            segment_size=4096, stem=True, html_col="html",
            salt_threshold=max(BENCH_DOCS // 8, 1000), max_salts=cores,
        )
        return time.time() - t0
    finally:
        spark.stop()


def main() -> None:
    queries: dict[str, float] = {}
    extra: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="bench_idx_")
    idx_big = os.path.join(work, "idx_main")

    # --- phase 1/2: build throughput + scaling
    t_main = build_at(CPUS, idx_big)
    queries["index_build_pages"] = round(t_main, 3)
    extra[f"docs_per_sec_{CPUS}"] = round(BENCH_DOCS / t_main, 1)
    if SCALING and CPUS != 8:
        idx8 = os.path.join(work, "idx8")
        t8 = build_at(8, idx8)
        queries["index_build_pages_8c"] = round(t8, 3)
        extra["docs_per_sec_8"] = round(BENCH_DOCS / t8, 1)
        ratio = CPUS / 8
        extra["scaling_efficiency"] = round(
            (BENCH_DOCS / t_main) / (ratio * (BENCH_DOCS / t8)), 3
        )

    # --- phase 3: headline driver queries at SF_DIR
    from search_engine_spark.entry_queries import QUERIES
    from search_engine_spark.session import get_spark

    spark = get_spark("bench-queries", cores=CPUS, shuffle_partitions=CPUS)
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()  # force full execution
        queries[name] = round(time.time() - t0, 3)
        _ = n

    # --- phase 4: query latency over the built index
    from search_engine_spark.plans.index_query import IndexReader

    reader = IndexReader(spark, idx_big)
    t0 = time.time()
    reader.search("spark join", k=10).collect()
    queries["bm25_index_distributed"] = round(time.time() - t0, 3)
    spark.stop()

    from search_engine_spark.plans.wand import LocalSearcher

    s = LocalSearcher(idx_big)
    for q in WAND_QUERIES:
        s.search(q, k=10)  # warm
    lat = []
    for _ in range(100):
        for q in WAND_QUERIES:
            t0 = time.perf_counter()
            s.search(q, k=10)
            lat.append(time.perf_counter() - t0)
    p50 = statistics.median(lat)
    queries["bm25_wand_local"] = round(p50, 6)
    extra["wand_p50_ms"] = round(p50 * 1000, 3)

    shutil.rmtree(work, ignore_errors=True)
    out = {
        "metric": "index_build_seconds",
        "value": round(t_main, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "bench_docs": BENCH_DOCS,
        "cpus": CPUS,
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
