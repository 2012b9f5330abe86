"""MMR diversification re-rank (operators/similarity.mmr_rerank) vs an
independent pure-Python greedy reference."""

from __future__ import annotations

import math
import random

import pytest

from search_engine_spark.operators.similarity import mmr_rerank


def _ref_mmr(cands, lam, k, normalize=True):
    """Reference: dict-of-lists greedy, cosine via plain loops."""
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return dot / (na * nb)

    out = {}
    by_q = {}
    for q, d, s, v in cands:
        by_q.setdefault(q, []).append((d, s, v))
    for q, items in by_q.items():
        items = sorted(items)  # doc_id asc: first-max tie-break base
        rel = [s for _, s, _ in items]
        if normalize:
            lo, hi = min(rel), max(rel)
            rel = (
                [(s - lo) / (hi - lo) for s in rel]
                if hi > lo else [1.0] * len(rel)
            )
        selected, remaining, rows = [], list(range(len(items))), []
        while remaining and len(selected) < k:
            best_j, best_v = 0, None
            for j, i in enumerate(remaining):
                pen = max(
                    (cos(items[i][2], items[s][2]) for s in selected),
                    default=0.0,
                )
                v = lam * rel[i] - (1 - lam) * pen
                if best_v is None or v > best_v:
                    best_j, best_v = j, v
            pick = remaining.pop(best_j)
            selected.append(pick)
            rows.append((items[pick][0], len(selected), best_v))
        out[q] = rows
    return out


def _collect(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["mmr_score"])
        )
    return {q: sorted(v) for q, v in out.items()}


def _df(spark, cands):
    return spark.createDataFrame(
        [(str(q), d, float(s), [float(x) for x in v])
         for q, d, s, v in cands],
        "query_id string, doc_id long, score double, "
        "embedding array<double>",
    )


def test_lambda_one_is_relevance_order(spark):
    cands = [("q", d, 10.0 - d, [1.0, 0.0]) for d in range(6)]
    got = _collect(mmr_rerank(_df(spark, cands), lam=1.0, k=4))
    assert [d for _, d, _ in got["q"]] == [0, 1, 2, 3]


def test_duplicate_embedding_demoted(spark):
    # docs 0 and 1: near-identical scores, IDENTICAL embeddings;
    # doc 2: slightly lower score, orthogonal. With lam=0.5 the
    # duplicate's penalty (cos=1) must push it below the diverse doc.
    cands = [
        ("q", 0, 1.00, [1.0, 0.0]),
        ("q", 1, 0.99, [1.0, 0.0]),
        ("q", 2, 0.90, [0.0, 1.0]),
    ]
    got = _collect(mmr_rerank(_df(spark, cands), lam=0.5, k=3))
    assert [d for _, d, _ in got["q"]] == [0, 2, 1]


def test_matches_reference_fuzz(spark):
    rng = random.Random(99)
    cands = []
    for q in range(8):
        for d in range(20):
            vec = [rng.uniform(-1, 1) for _ in range(8)]
            cands.append((f"q{q}", d, rng.uniform(0, 5), vec))
    for lam in (0.0, 0.3, 0.7, 1.0):
        got = _collect(mmr_rerank(_df(spark, cands), lam=lam, k=10))
        want = _ref_mmr(cands, lam, 10)
        assert set(got) == set(want)
        for q in want:
            assert [d for _, d, _ in got[q]] == [d for d, _, _ in want[q]], (
                q, lam
            )
            for (_, _, gs), (_, _, ws) in zip(got[q], want[q]):
                assert gs == pytest.approx(ws, abs=1e-5)


def test_fewer_candidates_than_k(spark):
    cands = [("q", 0, 1.0, [1.0]), ("q", 1, 0.5, [0.5])]
    got = _collect(mmr_rerank(_df(spark, cands), lam=0.7, k=10))
    assert len(got["q"]) == 2


def test_bad_lambda_rejected(spark):
    with pytest.raises(ValueError):
        mmr_rerank(_df(spark, [("q", 0, 1.0, [1.0])]), lam=1.5)


def test_cli_diversify(tmp_path):
    """query.py --diversify: a planted near-duplicate embedding of the
    top hit must be demoted below a diverse doc."""
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    idx = tmp_path / "idx"
    r = subprocess.run(
        [sys.executable, "build_index.py", "--input",
         "/root/testdata/sf0.001/documents.parquet", "--input-format",
         "documents", "--index-dir", str(idx), "--n-buckets", "4"],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    base = subprocess.run(
        [sys.executable, "query.py", "--index-dir", str(idx),
         "spark join", "-k", "5"],
        cwd="/root/repo", capture_output=True, text=True,
    )
    ranked = [int(l.split("\t")[1]) for l in base.stdout.splitlines()
              if l.split("\t")[0].isdigit()]
    assert len(ranked) == 5

    rng = np.random.default_rng(3)
    emb = rng.normal(size=(500, 6)).astype("float32")
    emb[ranked[1]] = emb[ranked[0]] + 1e-5  # rank-2 duplicates rank-1
    pq.write_table(
        pa.table({"doc_id": np.arange(500), "embedding": list(emb)}),
        str(tmp_path / "emb.parquet"),
    )
    div = subprocess.run(
        [sys.executable, "query.py", "--index-dir", str(idx),
         "spark join", "-k", "5", "--diversify", "0.5",
         "--embeddings", str(tmp_path / "emb.parquet")],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert div.returncode == 0, div.stderr[-2000:]
    got = [int(l.split("\t")[1]) for l in div.stdout.splitlines()
           if l.split("\t")[0].isdigit()]
    assert set(got) == set(ranked)          # re-rank, never drop
    assert got[0] == ranked[0]              # top relevance survives
    assert got.index(ranked[1]) > 1         # the duplicate is demoted
