#!/usr/bin/env python
"""Per-round benchmark (driver contract + BASELINE.md protocol).

Phases:
1. Materialize a deterministic synthetic pages corpus to parquet
   (SPARK_GRAFT_BENCH_DOCS, default 600000) — untimed.
2. Index build from that corpus at each level in
   SPARK_GRAFT_BENCH_CORES (default "1,4,8,32"): headline docs/sec
   at $SPARK_GRAFT_CPUS, plus N vs 4N scaling efficiency =
   T(N) / (4 x T(4N)) for each measured pair. 1 vs 4 is the primary
   pair: BOTH levels sit below this box's measured memory-bandwidth
   saturation (from ~8 busy cores up the shared bus ceiling-clips
   the 4N level of the 2->8 pair — see BENCH/BASELINE.md protocol
   runs + hardware calibration); a real multi-executor cluster adds
   a memory bus per node.
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
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "600000"))
# parallelism levels for the N vs 4N scaling evidence (BENCH/BASELINE.md):
# 2 vs 8 sits below this box's measured memory-bandwidth saturation
# (~16 busy cores); the full-width level reports peak throughput.
SCALE_CORES = [
    int(c)
    for c in os.environ.get("SPARK_GRAFT_BENCH_CORES", "1,4,8,32").split(",")
]
SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
# this host's wall-times vary ±30-50% run to run (BENCH/BASELINE.md);
# the scaling-efficiency levels (<=16 cores, below the box's memory-bus
# saturation) are therefore measured as a median of N runs. The
# full-width headline stays single-run (it only reports peak).
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

HEADLINE = [
    "bm25_topk", "bm25_single_term", "term_frequency", "document_frequency",
    "dedup_exact_text", "ann_cosine_topk", "latest_event_per_user",
    "pricing_summary", "revenue_by_nation",
]
WAND_QUERIES = ["the", "spark join", "data filter window", "index search merge"]
PHRASE_QUERIES = ["the bold", "of the", "spark join", "data filter window"]


_QPS_STATE: dict = {}


def _qps_init(index_dir: str, queries: list) -> None:
    """Pool-worker initializer: build and warm this replica's searcher
    (runs at worker spawn, before the timed window)."""
    from search_engine_spark.plans.wand import LocalSearcher

    s = LocalSearcher(index_dir)
    for q in queries:
        s.search(q, k=10)
        s.search(q, k=10, mode="or")
    _QPS_STATE["s"] = s
    _QPS_STATE["queries"] = queries


def _qps_loop(n: int) -> int:
    s = _QPS_STATE["s"]
    qs = _QPS_STATE["queries"]
    for i in range(n):
        s.search(qs[i % len(qs)], k=10, mode="or" if i % 2 else "and")
    return n


def materialize_corpus(corpus_dir: str) -> None:
    """One-time (untimed) corpus synthesis: generate -> dedup -> dense
    ids -> parquet. The timed builds then all read the SAME on-disk
    table, which is what index-build throughput means."""
    from search_engine_spark.operators.dedup import latest_snapshot
    from search_engine_spark.operators.ids import assign_dense_ids
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.pages import generate_pages

    spark = get_spark("bench-gen", cores=CPUS, shuffle_partitions=128)
    try:
        pages = generate_pages(spark, BENCH_DOCS, partitions=256)
        src = assign_dense_ids(latest_snapshot(pages, "url", "warc_ts"), "url")
        src.write.mode("overwrite").parquet(corpus_dir)
    finally:
        spark.stop()


def build_at(cores: int, corpus_dir: str, out_dir: str) -> float:
    """Build the index at one parallelism level; returns build wall
    seconds. The JOB is byte-identical across core counts — same input
    files, bucket count, salting, shuffle partitions — so runs differ
    only in executor slots, which is what the north_rule's N vs 4N
    scaling-efficiency criterion measures. A small warmup job spins up
    the Python workers before the clock starts (a real cluster
    amortizes worker startup over hours)."""
    from search_engine_spark.operators.aggregates import postings_from_text
    from search_engine_spark.plans.build_index import build_index
    from search_engine_spark.session import get_spark

    spark = get_spark(f"bench-build-{cores}", cores=cores,
                      shuffle_partitions=128)
    try:
        src = spark.read.parquet(corpus_dir)
        postings_from_text(src.limit(2000), html_col="html").count()  # warm
        t0 = time.time()
        build_index(
            spark, src, out_dir, n_buckets=64,
            segment_size=4096, stem=True, html_col="html",
            salt_threshold=max(BENCH_DOCS // 8, 1000), max_salts=16,
        )
        return time.time() - t0
    finally:
        spark.stop()


def host_noise_probe() -> dict:
    """This box's memory bandwidth swings >100x under neighbor load
    (a bare 17 MB memcpy measured 4.6ms..582ms across runs). Record
    the spread alongside every bench so the numbers carry their own
    noise context."""
    import numpy as np

    a = np.zeros(17_000_000, dtype=np.uint8)
    samples = []
    for _ in range(7):
        t0 = time.perf_counter()
        b = a.copy()
        samples.append((time.perf_counter() - t0) * 1000)
        del b
    samples.sort()
    return {
        "memcpy17mb_ms_min": round(samples[0], 2),
        "memcpy17mb_ms_p50": round(samples[len(samples) // 2], 2),
        "memcpy17mb_ms_max": round(samples[-1], 2),
    }


def main() -> None:
    queries: dict[str, float] = {}
    extra: dict[str, float] = {}
    extra.update(host_noise_probe())
    work = tempfile.mkdtemp(prefix="bench_idx_")
    corpus = os.path.join(work, "corpus")

    # --- phase 1/2: build throughput at each parallelism level
    materialize_corpus(corpus)
    levels = SCALE_CORES if SCALING else [CPUS]
    times: dict[int, float] = {}
    idx_big = ""
    for cores in sorted(set(levels + [CPUS])):
        if not SCALING and cores != CPUS:
            continue
        out = os.path.join(work, f"idx_{cores}c")
        reps = REPEATS if (SCALING and cores <= 16) else 1
        runs = [build_at(cores, corpus, out) for _ in range(reps)]
        times[cores] = statistics.median(runs)
        queries[f"index_build_{cores}c"] = round(times[cores], 3)
        extra[f"docs_per_sec_{cores}"] = round(BENCH_DOCS / times[cores], 1)
        if reps > 1:
            extra[f"build_runs_{cores}c"] = [round(r, 3) for r in runs]
        if cores == CPUS:
            idx_big = out
    t_main = times[CPUS]
    # N -> 4N pairs present in the measured levels. 1->4 is the
    # primary pair: BOTH levels sit under this box's memory-bus
    # saturation (~11.5k docs/s from ~8 busy cores), so it isolates
    # job scaling from the shared-bus ceiling — see BENCH/BASELINE.md
    # protocol runs + hardware calibration.
    for lo, hi in ((1, 4), (2, 8), (4, 16), (8, 32)):
        if lo in times and hi in times:
            extra[f"scaling_efficiency_{lo}_{hi}"] = round(
                times[lo] / (4.0 * times[hi]), 3
            )
    for pair in ("1_4", "2_8", "8_32"):
        if f"scaling_efficiency_{pair}" in extra:
            extra["scaling_efficiency"] = extra[f"scaling_efficiency_{pair}"]
            break

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

    # --- tiered merge cost (round-4): fold a 10% shard into the big
    # index. merge_into must cost O(incoming), i.e. far below the
    # full-rebuild merge of the same pair (which re-segments 110%).
    from search_engine_spark.plans.build_index import build_index
    from search_engine_spark.plans.merge import merge_indexes, merge_into
    from search_engine_spark.sources.pages import generate_pages

    from search_engine_spark.operators.dedup import latest_snapshot
    from search_engine_spark.operators.ids import assign_dense_ids

    shard_docs = max(BENCH_DOCS // 10, 1000)
    shard_src = os.path.join(work, "shard_corpus")
    assign_dense_ids(
        latest_snapshot(generate_pages(spark, shard_docs, partitions=32),
                        "url", "warc_ts"),
        "url",
    ).write.mode("overwrite").parquet(shard_src)
    shard_idx = os.path.join(work, "shard_idx")
    t0 = time.time()
    build_index(
        spark, spark.read.parquet(shard_src), shard_idx, n_buckets=64,
        segment_size=4096, stem=True, html_col="html",
        salt_threshold=max(BENCH_DOCS // 8, 1000), max_salts=16,
    )
    extra["merge_shard_build_s"] = round(time.time() - t0, 3)
    merge_target = os.path.join(work, "idx_merge_target")
    shutil.copytree(idx_big, merge_target)
    t0 = time.time()
    merge_into(spark, merge_target, shard_idx)
    extra["merge_into_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    merge_indexes(spark, idx_big, shard_idx,
                  os.path.join(work, "idx_merge_rebuilt"), rebuild=True)
    extra["merge_rebuild_s"] = round(time.time() - t0, 3)
    shutil.rmtree(merge_target, ignore_errors=True)
    shutil.rmtree(os.path.join(work, "idx_merge_rebuilt"),
                  ignore_errors=True)

    # positional table (same corpus) for the phrase-serving p50
    from search_engine_spark.plans.positions import build_positions

    t0 = time.time()
    build_positions(
        spark, spark.read.parquet(corpus), idx_big,
        n_buckets=64, stem=True, html_col="html",
    )
    extra["positions_build_s"] = round(time.time() - t0, 3)

    # phrase-acceleration bigram table (nextword index) — built AFTER
    # the throughput metrics so index_build_*c stays comparable across
    # rounds; measured separately
    from search_engine_spark.plans.bigrams import build_bigrams

    t0 = time.time()
    build_bigrams(
        spark, spark.read.parquet(corpus), idx_big,
        n_buckets=64, stem=True, html_col="html", top_terms=32,
    )
    extra["bigrams_build_s"] = round(time.time() - t0, 3)
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

    # disjunctive (OR) block-max path on the same query set
    for q in WAND_QUERIES:
        s.search(q, k=10, mode="or")  # warm
    lat_or = []
    for _ in range(100):
        for q in WAND_QUERIES:
            t0 = time.perf_counter()
            s.search(q, k=10, mode="or")
            lat_or.append(time.perf_counter() - t0)
    extra["wand_or_p50_ms"] = round(statistics.median(lat_or) * 1000, 3)

    # concurrent serving throughput (round 4): replica-per-PROCESS —
    # the real deployment shape (a thread pool cannot scale this: the
    # searcher's orchestration is Python, so the GIL serializes it;
    # measured 0.09 thread-efficiency at 8t). Each worker process owns
    # its own warmed LocalSearcher; all replicas read the same on-disk
    # index through the shared page cache, exactly like N serving
    # containers on one node. Pool initializer builds+warms BEFORE the
    # timed map, so the window measures steady-state serving only.
    import multiprocessing as _mp

    n_procs = 8
    per_proc = 50
    ctx = _mp.get_context("fork")
    with ctx.Pool(
        n_procs, initializer=_qps_init, initargs=(idx_big, WAND_QUERIES)
    ) as pool:
        # one throwaway round ensures every worker finished its
        # initializer (fork+warm) before the timed window opens
        pool.map(_qps_loop, [1] * n_procs)
        t0 = time.perf_counter()
        pool.map(_qps_loop, [per_proc] * n_procs)
        t_np = time.perf_counter() - t0
    with ctx.Pool(1, initializer=_qps_init,
                  initargs=(idx_big, WAND_QUERIES)) as pool:
        pool.map(_qps_loop, [1])
        t0 = time.perf_counter()
        pool.map(_qps_loop, [per_proc])
        t_1p = time.perf_counter() - t0
    extra["serve_qps_1p"] = round(per_proc / t_1p, 1)
    extra["serve_qps_8p"] = round(n_procs * per_proc / t_np, 1)
    extra["serve_proc_scaling_1_8"] = round(
        (n_procs * per_proc / t_np) / (per_proc / t_1p) / n_procs, 3
    )

    # static-boost serving p50 (round 4): a PageRank-shaped prior over
    # ~60% of docs; measures the +bmax bound and the per-result boost
    # lookup on the block-max AND path. Expect ~= wand_p50_ms — boost
    # is one vectorized searchsorted per surviving segment.
    import numpy as _np

    _rng = _np.random.RandomState(11)
    _n_boost = int(s.n_docs * 0.6)
    _bids = _np.sort(_rng.choice(s.n_docs, size=_n_boost, replace=False))
    import pandas as _pd

    s.load_static_boosts(_pd.DataFrame({
        "doc_id": _bids.astype("int64"),
        "boost": _rng.rand(_n_boost) * 2.0,
    }))
    for q in WAND_QUERIES:
        s.search(q, k=10)  # warm
    lat_b = []
    for _ in range(100):
        for q in WAND_QUERIES:
            t0 = time.perf_counter()
            s.search(q, k=10)
            lat_b.append(time.perf_counter() - t0)
    extra["wand_boosted_p50_ms"] = round(
        statistics.median(lat_b) * 1000, 3
    )

    # minimum-should-match OR p50 (round 4): msm=2 over the multi-term
    # queries (a single-term query with msm=2 is a trivial empty)
    msm_queries = [q for q in WAND_QUERIES if len(q.split()) >= 2]
    lat_m = []
    for q in msm_queries:
        s.search(q, k=10, mode="or", msm=2)  # warm
    for _ in range(100):
        for q in msm_queries:
            t0 = time.perf_counter()
            s.search(q, k=10, mode="or", msm=2)
            lat_m.append(time.perf_counter() - t0)
    extra["wand_msm_p50_ms"] = round(statistics.median(lat_m) * 1000, 3)
    s.clear_static_boosts()

    # filter-clause (restrict) p50 (round 4): site:/ts-window shape —
    # an allow-list of ~50% of docs on the block-max AND path. Expect
    # ~= wand_p50_ms: the mask is one vectorized searchsorted per
    # candidate batch at candidate generation.
    _allow = _np.arange(0, s.n_docs, 2, dtype=_np.int64)
    for q in WAND_QUERIES:
        s.search(q, k=10, restrict=_allow)  # warm
    lat_r = []
    for _ in range(100):
        for q in WAND_QUERIES:
            t0 = time.perf_counter()
            s.search(q, k=10, restrict=_allow)
            lat_r.append(time.perf_counter() - t0)
    extra["wand_restrict_p50_ms"] = round(
        statistics.median(lat_r) * 1000, 3
    )

    # LM-Dirichlet p50 (round 4): the second similarity serves
    # EXHAUSTIVE by design (BM25-baked impacts can't bound it), so
    # this is the scatter cost over the same adversarial query set
    t0 = time.perf_counter()
    for q in WAND_QUERIES:
        s.search_lmd(q, k=10, mode="or")  # warm
    _t_pass = time.perf_counter() - t0
    lat_l = []
    reps_l = max(3, min(100, int(3.0 / max(_t_pass, 1e-3))))
    for _ in range(reps_l):
        for q in WAND_QUERIES:
            t0 = time.perf_counter()
            s.search_lmd(q, k=10, mode="or")
            lat_l.append(time.perf_counter() - t0)
    extra["lmd_p50_ms"] = round(statistics.median(lat_l) * 1000, 3)

    # grouped boolean serving p50 (round 2+): OR-groups built from
    # adjacent WAND query terms — includes the stopword head, so the
    # smallest-group candidate-base optimization is what's measured
    grouped_queries = [
        " ".join(f"{a}|{b}" for a, b in zip(q.split(), q.split()[1:]))
        or q
        for q in WAND_QUERIES
    ]
    for q in grouped_queries:
        s.search_grouped(q, k=10)  # warm
    lat_g = []
    for _ in range(100):
        for q in grouped_queries:
            t0 = time.perf_counter()
            s.search_grouped(q, k=10)
            lat_g.append(time.perf_counter() - t0)
    extra["grouped_p50_ms"] = round(statistics.median(lat_g) * 1000, 3)

    # exact-phrase serving p50 (positional index; includes the
    # hottest stopword bigram — worst-case candidate volume)
    from search_engine_spark.plans.positions import PhraseSearcher

    # COLD first-contact latency (round-2 weak spot #1): a fresh
    # searcher per query so every read/decode path starts empty;
    # median-of-3 per query to shed the host's memcpy noise spikes
    cold = {}
    for q in PHRASE_QUERIES:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            s_cold = PhraseSearcher(idx_big)
            # historical metric: the PURE positional path (the bigram
            # table now sits in the index dir — disable it here so
            # phrase_cold_s stays comparable across rounds)
            s_cold._bigrams_loaded = True
            s_cold._bigrams = None
            s_cold.search_phrase(q, k=10)
            runs.append(time.perf_counter() - t0)
        cold[q] = round(statistics.median(runs), 3)
    extra["phrase_cold_s"] = cold
    extra["phrase_cold_max_s"] = max(cold.values())

    # ACCELERATED cold path: same fresh-searcher protocol, bigram
    # table live (the production configuration once built) — the
    # stopword bigram becomes a direct posting read
    cold_a = {}
    for q in PHRASE_QUERIES:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            PhraseSearcher(idx_big).search_phrase(q, k=10)
            runs.append(time.perf_counter() - t0)
        cold_a[q] = round(statistics.median(runs), 3)
    extra["phrase_cold_accel_s"] = cold_a
    extra["phrase_cold_accel_max_s"] = max(cold_a.values())

    ps = PhraseSearcher(idx_big)
    ps._bigrams_loaded = True  # historical warm metric: positional path
    ps._bigrams = None
    t0 = time.perf_counter()
    for q in PHRASE_QUERIES:
        ps.search_phrase(q, k=10)  # warm (reads + caches term rows)
    t_pass = time.perf_counter() - t0
    # adaptive repetitions: ~5s budget (the stopword bigram scans a
    # large candidate set by design — worst case, not typical case)
    reps = max(3, min(50, int(5.0 / max(t_pass, 1e-3))))
    lat_ph = []
    for _ in range(reps):
        for q in PHRASE_QUERIES:
            t0 = time.perf_counter()
            ps.search_phrase(q, k=10)
            lat_ph.append(time.perf_counter() - t0)
    extra["phrase_p50_ms"] = round(statistics.median(lat_ph) * 1000, 3)

    psa = PhraseSearcher(idx_big)  # accelerated warm p50
    for q in PHRASE_QUERIES:
        psa.search_phrase(q, k=10)
    lat_pa = []
    for _ in range(reps):
        for q in PHRASE_QUERIES:
            t0 = time.perf_counter()
            psa.search_phrase(q, k=10)
            lat_pa.append(time.perf_counter() - t0)
    extra["phrase_accel_p50_ms"] = round(
        statistics.median(lat_pa) * 1000, 3
    )

    # mixed phrase+boolean serving (plans/phraseq): quoted clause +
    # boolean remainder, production config (bigram table live)
    from search_engine_spark.plans.phraseq import search_mixed
    from search_engine_spark.plans.wand import LocalSearcher as _LS

    MIXED_QUERIES = ['"of the" data^2 -scan', '"the bold" data|filter']
    sm, pm = _LS(idx_big), PhraseSearcher(idx_big)
    for q in MIXED_QUERIES:
        search_mixed(sm, pm, q, k=10)  # warm
    lat_mx = []
    for _ in range(reps):
        for q in MIXED_QUERIES:
            t0 = time.perf_counter()
            search_mixed(sm, pm, q, k=10)
            lat_mx.append(time.perf_counter() - t0)
    extra["mixed_p50_ms"] = round(statistics.median(lat_mx) * 1000, 3)

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
