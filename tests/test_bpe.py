"""BPE vocabulary learning / encoding (operators/bpe.py).

The incremental merge loop is pinned against an INDEPENDENT naive
reference that recounts every pair from scratch each iteration — two
implementations of the published algorithm (Sennrich et al. 2016) that
share no code.
"""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.operators.bpe import (
    apply_bpe,
    encode_word,
    learn_bpe,
    pair_counts,
    word_counts,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker they come the quicker they go",
    "low lower lowest slow slower slowest",
    "new newer newest few fewer fewest",
    "hugs hugging hugged bug bugs debug debugger",
    "it's the thing that things think about things",
]


def _naive_bpe(word_cnt: dict[str, int], n_merges: int):
    """Reference: full pair recount every iteration, same tie-break
    (count desc, pair lexicographic asc)."""
    vocab = {w: [c for c in w] for w in word_cnt}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + word_cnt[w]
        counts = {p: c for p, c in counts.items() if c > 0}
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_merge_loop_matches_naive_reference(spark):
    # word counts computed once distributively, then both loops run on
    # the same table (min_count=1 so the tiny corpus survives the cap)
    wc_rows = word_counts(_docs(spark)).collect()
    word_cnt = {r["word"]: int(r["count"]) for r in wc_rows}

    got = learn_bpe(_docs(spark), 40, min_count=1)
    want = _naive_bpe(word_cnt, 40)
    assert got == want


def test_word_counts_matches_pandas():
    # independent pandas recount of the pretokenizer aggregation
    import re

    pat = re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+"
    )
    from collections import Counter

    want = Counter(w for t in TEXTS for w in pat.findall(t))
    from search_engine_spark.session import get_spark

    spark = get_spark("t-bpe")
    got = {
        r["word"]: int(r["count"])
        for r in word_counts(_docs(spark)).collect()
    }
    assert got == dict(want)


def test_pair_counts_weighted_by_word_count(spark):
    wc = spark.createDataFrame(
        [("aba", 3), ("ab", 2), ("z", 5)], "word string, count long"
    )
    got = {r["pair"]: r["pair_count"] for r in pair_counts(wc).collect()}
    # "aba" contributes ab,ba ×3; "ab" contributes ab ×2; "z" nothing
    assert got == {"ab": 5, "ba": 3}


def test_encode_word_respects_rank_order():
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2}
    assert encode_word("lower", ranks) == ["low", "er"]
    assert encode_word("low", ranks) == ["low"]
    assert encode_word("xyz", ranks) == ["x", "y", "z"]
    assert encode_word("", ranks) == []


def test_more_merges_never_increase_token_count(spark):
    merges = learn_bpe(_docs(spark), 60, min_count=1)
    ranks_all = {p: i for i, p in enumerate(merges)}
    for k in (0, 10, 30, 60):
        ranks_k = {p: i for i, p in enumerate(merges[:k])}
        for t in TEXTS:
            for w in t.split(" "):
                assert len(encode_word(w, ranks_all)) <= len(
                    encode_word(w, ranks_k)
                )


def test_apply_bpe_matches_driver_side_encode(spark):
    merges = learn_bpe(_docs(spark), 30, min_count=1)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in apply_bpe(_docs(spark), merges).collect()
    }
    import re

    pat = re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+"
    )
    ranks = {p: i for i, p in enumerate(merges)}
    want = {
        i: sum(len(encode_word(w, ranks)) for w in pat.findall(t))
        for i, t in enumerate(TEXTS)
    }
    assert got == want


def test_learn_bpe_deterministic(spark):
    a = learn_bpe(_docs(spark), 25, min_count=1)
    b = learn_bpe(_docs(spark), 25, min_count=1)
    assert a == b and len(a) == 25


def test_merge_loop_stops_when_exhausted(spark):
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    merges = learn_bpe(docs, 50, min_count=1)
    # pretokens "ab" and " ab": finitely many mergeable pairs
    assert 0 < len(merges) < 50


def test_cli_learn_and_apply_roundtrip(tmp_path):
    """Drive the index_admin learn-bpe / apply-bpe wiring end to end."""
    import json
    import subprocess
    import sys

    import pyarrow.dataset as ds

    corpus = "/root/testdata/sf0.001/documents.parquet"
    merges_path = tmp_path / "merges.json"
    out_dir = tmp_path / "bpe_counts"
    r = subprocess.run(
        [sys.executable, "index_admin.py", "learn-bpe", "--input", corpus,
         "--out", str(merges_path), "--n-merges", "50"],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    blob = json.loads(merges_path.read_text())
    assert 0 < blob["n_merges"] <= 50
    r = subprocess.run(
        [sys.executable, "index_admin.py", "apply-bpe", "--input", corpus,
         "--merges", str(merges_path), "--out", str(out_dir)],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    t = ds.dataset(str(out_dir)).to_table().to_pandas()
    assert len(t) == 500 and (t["n_bpe_tokens"] > 0).all()
