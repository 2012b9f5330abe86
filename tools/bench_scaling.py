#!/usr/bin/env python
"""Focused N -> 4N scaling evidence (north-rule criterion) at core
levels that BOTH sit below the box's memory-bandwidth ceiling.

Why not 2->8: the full bench's quiet-host attempt IV measured the box
saturating at ~11.5k docs/s from 8 cores up (8c 11.3k, 16c 11.7k,
32c 10.8k) while 2c runs at its full per-core rate (2×2268=4.5k).
On a SHARED memory bus the 4N level is therefore ceiling-clipped and
2->8 efficiency reads ~0.62 precisely WHEN the host is quiet — the
opposite failure mode of the noise the protocol guards against. A
real 4N-executor cluster adds 4x memory channels with the executors;
the shared-bus box cannot. 1c -> 4c keeps both levels under the
ceiling (1c ~2.3k, 4c ~9.1k < 11.5k), so it isolates the quantity the
north rule actually asks about: does the JOB scale, or does it
serialize? Interleaved reps (1,4,1,4,...) spread host drift evenly
across both levels.

Usage: python tools/bench_scaling.py [out.json]
Env: SPARK_GRAFT_BENCH_DOCS (default 600000), SPARK_GRAFT_BENCH_REPEATS
(default 3), SPARK_GRAFT_SCALING_CORES (default "1,4").
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _kernel_mem(q) -> None:
    import time

    import numpy as np

    a = np.arange(8_000_000, dtype=np.int64)
    t0 = time.perf_counter()
    for _ in range(30):
        b = (a * 1_000_003) ^ (a >> 7)
        b.copy()
    q.put(time.perf_counter() - t0)


def _kernel_cpu(q) -> None:
    import time

    import numpy as np

    a = np.arange(200_000, dtype=np.int64)  # L2-resident: no bus
    t0 = time.perf_counter()
    for _ in range(1200):
        b = (a * 1_000_003) ^ (a >> 7)
        b * b + 17
    q.put(time.perf_counter() - t0)


def hardware_calibration(lo: int, hi: int) -> dict:
    """Measure the BOX's own lo->hi process-scaling ceiling with two
    trivial kernels: a memory-heavy one (hash+copy over 64 MB — the
    index build's traffic shape) and an L2-resident compute one.
    Retention = median per-proc time at lo / at hi; 1.0 = perfect.
    The spread between the two tells whether an observed job
    efficiency is job serialization (cpu retention would drop too) or
    the shared memory bus (only mem retention drops) — on a real
    cluster the 4N executors bring 4N memory channels, so the cpu
    number is the transferable bound."""
    import multiprocessing as mp
    import statistics

    def run(fn, n: int) -> float:
        q = mp.Queue()
        ps = [mp.Process(target=fn, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        return statistics.median(q.get() for _ in ps)

    out = {}
    for name, fn in (("mem", _kernel_mem), ("cpu", _kernel_cpu)):
        run(fn, 1)  # warmup (page-in, numpy init)
        los, his = [], []
        for _ in range(5):  # interleaved: host drift hits both levels
            los.append(run(fn, lo))
            his.append(run(fn, hi))
        t_lo, t_hi = statistics.median(los), statistics.median(his)
        out[f"kernel_{name}_{lo}p_s"] = round(t_lo, 3)
        out[f"kernel_{name}_{hi}p_s"] = round(t_hi, 3)
        out[f"kernel_{name}_retention"] = round(t_lo / t_hi, 3)
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    lo, hi = (
        int(c) for c in os.environ.get(
            "SPARK_GRAFT_SCALING_CORES", "1,4"
        ).split(",")
    )
    reps = bench.REPEATS
    work = tempfile.mkdtemp(prefix="bench_scale_")
    corpus = os.path.join(work, "corpus")
    result: dict = {"metric": f"scaling_{lo}c_{hi}c",
                    "bench_docs": bench.BENCH_DOCS,
                    "probe_start": bench.host_noise_probe(),
                    "hardware": hardware_calibration(lo, hi)}
    try:
        bench.materialize_corpus(corpus)
        runs: dict[int, list[float]] = {lo: [], hi: []}
        for i in range(reps):
            for cores in (lo, hi):  # interleaved: drift hits both
                d = os.path.join(work, f"idx_{cores}c_{i}")
                runs[cores].append(
                    round(bench.build_at(cores, corpus, d), 3)
                )
                shutil.rmtree(d, ignore_errors=True)
        result["probe_end"] = bench.host_noise_probe()
        med = {c: statistics.median(r) for c, r in runs.items()}
        spread = {
            c: round(
                max(abs(x - med[c]) for x in r) / med[c], 3
            )
            for c, r in runs.items()
        }
        eff = med[lo] / ((hi / lo) * med[hi])
        result.update({
            f"build_runs_{lo}c": runs[lo],
            f"build_runs_{hi}c": runs[hi],
            f"median_{lo}c_s": med[lo],
            f"median_{hi}c_s": med[hi],
            f"spread_{lo}c": spread[lo],
            f"spread_{hi}c": spread[hi],
            f"docs_per_sec_{lo}": round(bench.BENCH_DOCS / med[lo], 1),
            f"docs_per_sec_{hi}": round(bench.BENCH_DOCS / med[hi], 1),
            "scaling_efficiency": round(eff, 3),
        })
    finally:
        shutil.rmtree(work, ignore_errors=True)
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
