"""Phrase queries: scan path (operators/phrases.py) vs positional
index path (plans/positions.py) vs an independent pure-Python
reference, plus codec roundtrip and the Gopher dup-ngram signals."""

import os
import random

import numpy as np
import pandas as pd
import pytest

from search_engine_spark.operators.phrases import (
    dup_ngram_stats,
    phrase_counts,
    phrase_topk,
)
from search_engine_spark.plans.positions import (
    PhraseSearcher,
    build_positions,
    decode_positions,
    encode_positions,
)


def ref_phrase_tf(tokens: list[str], phrase: list[str]) -> int:
    """Independent sliding-window count (overlaps included)."""
    k = len(phrase)
    if k == 0 or len(tokens) < k:
        return 0
    return sum(1 for i in range(len(tokens) - k + 1) if tokens[i:i + k] == phrase)


# ---------------------------------------------------------------------------
# positions codec
# ---------------------------------------------------------------------------

def test_positions_roundtrip_randomized():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(0, 200))
        pos = np.unique(rng.integers(0, 10_000, size=n))
        blob = encode_positions(pos)
        got = decode_positions(blob)
        assert np.array_equal(got, pos.astype(np.int64))


def test_positions_first_offset_zero():
    pos = np.array([0, 1, 5], dtype=np.int64)
    assert np.array_equal(decode_positions(encode_positions(pos)), pos)


# ---------------------------------------------------------------------------
# scan path
# ---------------------------------------------------------------------------

def test_scan_phrase_counts_vs_reference(spark, documents_pdf):
    docs = spark.createDataFrame(documents_pdf[["doc_id", "text"]])
    for phrase in (["table", "hash"], ["slow", "hash", "batch"], ["zzz"]):
        got = {
            int(r.doc_id): int(r.phrase_tf)
            for r in phrase_counts(docs, phrase).collect()
        }
        want = {}
        for _, row in documents_pdf.iterrows():
            tf = ref_phrase_tf(row.text.split(" "), phrase)
            if tf > 0:
                want[int(row.doc_id)] = tf
        assert got == want


def test_scan_phrase_overlaps_counted(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a a a a", "b a a b"]})
    )
    got = {int(r.doc_id): int(r.phrase_tf)
           for r in phrase_counts(df, ["a", "a"]).collect()}
    assert got == {1: 3, 2: 1}


def test_scan_phrase_topk_ranks(spark, documents_pdf):
    docs = spark.createDataFrame(documents_pdf[["doc_id", "text"]])
    rows = phrase_topk(docs, ["slow", "hash", "batch"], 10).collect()
    tfs = [(int(r.phrase_tf), int(r.doc_id)) for r in rows]
    assert tfs == sorted(tfs, key=lambda p: (-p[0], p[1]))
    assert [int(r.rank) for r in rows] == list(range(1, len(rows) + 1))


# ---------------------------------------------------------------------------
# positional index path == scan semantics (property test)
# ---------------------------------------------------------------------------

VOCAB = ["spark", "hash", "join", "scan", "table", "merge", "sort", "row"]


def _random_corpus(rng: random.Random, n_docs: int) -> pd.DataFrame:
    texts = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 40)))
        for _ in range(n_docs)
    ]
    return pd.DataFrame({"doc_id": range(n_docs), "text": texts})


@pytest.mark.parametrize("stem", [False, True])
def test_positional_index_equals_reference(spark, tmp_path, stem):
    from search_engine_spark.functions.text import analyze

    rng = random.Random(42 + stem)
    pdf = _random_corpus(rng, 120)
    idx_dir = os.path.join(str(tmp_path), f"idx_{stem}")
    build_positions(
        spark, spark.createDataFrame(pdf), idx_dir, n_buckets=4, stem=stem
    )
    searcher = PhraseSearcher(idx_dir)
    ref_tokens = {
        int(r.doc_id): analyze(r.text, stem=stem) for _, r in pdf.iterrows()
    }
    for _ in range(25):
        k = rng.randint(1, 3)
        phrase = [rng.choice(VOCAB) for _ in range(k)]
        phrase = analyze(" ".join(phrase), stem=stem)
        got = dict(searcher.phrase_counts(phrase))
        want = {
            d: ref_phrase_tf(toks, phrase)
            for d, toks in ref_tokens.items()
            if ref_phrase_tf(toks, phrase) > 0
        }
        assert got == want, phrase


def test_positional_search_topk_order(spark, tmp_path):
    rng = random.Random(9)
    pdf = _random_corpus(rng, 80)
    idx_dir = os.path.join(str(tmp_path), "idx_topk")
    build_positions(
        spark, spark.createDataFrame(pdf), idx_dir, n_buckets=4, stem=False
    )
    s = PhraseSearcher(idx_dir)
    hits = s.search_phrase("hash join", k=5)
    assert len(hits) <= 5
    keys = [(-tf, d) for d, tf in hits]
    assert keys == sorted(keys)
    full = dict(s.phrase_counts(["hash", "join"]))
    for d, tf in hits:
        assert full[d] == tf
    if len(full) > 5:
        worst_kept = min(-k[0] for k in keys)
        dropped = [tf for d, tf in full.items() if d not in dict(hits)]
        assert all(tf <= worst_kept for tf in dropped)


def test_pruned_search_equals_exhaustive(spark, tmp_path):
    """WAND-style bound pruning in search_phrase must equal the
    exhaustive sort of phrase_counts for every k."""
    rng = random.Random(23)
    pdf = _random_corpus(rng, 150)
    idx_dir = os.path.join(str(tmp_path), "idx_prune")
    build_positions(
        spark, spark.createDataFrame(pdf), idx_dir, n_buckets=4, stem=False
    )
    s = PhraseSearcher(idx_dir)
    for _ in range(20):
        phrase = [rng.choice(VOCAB) for _ in range(rng.randint(1, 3))]
        full = s.phrase_counts(phrase)
        full.sort(key=lambda r: (-r[1], r[0]))
        for k in (1, 3, 10, 10_000):
            assert s.search_phrase(phrase, k=k) == full[:k], (phrase, k)


def test_distributed_phrase_equals_local(spark, tmp_path):
    from search_engine_spark.plans.positions import phrase_search_distributed

    rng = random.Random(17)
    pdf = _random_corpus(rng, 100)
    idx_dir = os.path.join(str(tmp_path), "idx_dist")
    build_positions(
        spark, spark.createDataFrame(pdf), idx_dir, n_buckets=4, stem=False
    )
    local = PhraseSearcher(idx_dir)
    for phrase in (["table", "merge"], ["hash", "hash"],
                   ["spark", "join", "scan"], ["missing", "spark"]):
        want = local.search_phrase(phrase, k=8)
        got = [
            (int(r.doc_id), int(r.phrase_tf))
            for r in phrase_search_distributed(spark, idx_dir, phrase, k=8)
            .collect()
        ]
        assert got == want, phrase


def test_positional_repeated_word_phrase(spark, tmp_path):
    pdf = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["go go go stop", "go stop go"]}
    )
    idx_dir = os.path.join(str(tmp_path), "idx_rep")
    build_positions(
        spark, spark.createDataFrame(pdf), idx_dir, n_buckets=2, stem=False
    )
    s = PhraseSearcher(idx_dir)
    assert dict(s.phrase_counts(["go", "go"])) == {0: 2}
    assert dict(s.phrase_counts(["go", "stop"])) == {0: 1, 1: 1}
    assert dict(s.phrase_counts(["stop", "go"])) == {1: 1}
    assert s.phrase_counts(["stop", "stop"]) == []
    assert s.phrase_counts(["missing", "go"]) == []


def test_near_counts_index_vs_scan_vs_reference(spark, tmp_path):
    """Proximity: index path == scan path == brute-force reference."""
    from search_engine_spark.operators.phrases import near_counts as scan_near

    rng = random.Random(53)
    pdf = _random_corpus(rng, 120)
    idx_dir = os.path.join(str(tmp_path), "idx_near")
    build_positions(
        spark, spark.createDataFrame(pdf), idx_dir, n_buckets=4, stem=False
    )
    s = PhraseSearcher(idx_dir)
    docs = spark.createDataFrame(pdf)
    for a, b, slop in (("hash", "join", 3), ("table", "row", 1),
                       ("spark", "sort", 5), ("scan", "merge", 0)):
        idx_res = dict(s.near_counts(a, b, slop))
        scan_res = {
            int(r.doc_id): int(r.min_dist)
            for r in scan_near(docs, a, b, slop).collect()
        }
        ref = {}
        for _, row in pdf.iterrows():
            toks = row.text.split(" ")
            pa = [i for i, t in enumerate(toks) if t == a]
            pb = [i for i, t in enumerate(toks) if t == b]
            if pa and pb:
                d = min(abs(x - y) for x in pa for y in pb)
                if d <= slop:
                    ref[int(row.doc_id)] = d
        assert idx_res == ref, (a, b, slop)
        assert scan_res == ref, (a, b, slop)
    with pytest.raises(ValueError):
        s.near_counts("hash", "hash", 2)
    ranked = s.search_near("hash", "join", slop=4, k=5)
    keys = [(d, doc) for doc, d in ranked]
    assert keys == sorted(keys)[: len(keys)]


def test_positions_sql_view(spark, tmp_path):
    """The positions table registers into the SQL surface like every
    other index table; per-(term, doc) row counts agree with the
    serving reader."""
    from search_engine_spark.sources.catalog import register_index_views

    rng = random.Random(71)
    pdf = _random_corpus(rng, 40)
    idx_dir = os.path.join(str(tmp_path), "idx_sql")
    build_positions(spark, spark.createDataFrame(pdf), idx_dir,
                    n_buckets=4, stem=False)
    views = register_index_views(spark, idx_dir, prefix="sqlv_")
    assert "sqlv_positions" in views
    row = spark.sql(
        "SELECT count(*) AS n, sum(npos) AS total FROM sqlv_positions "
        "WHERE term = 'hash'"
    ).collect()[0]
    s = PhraseSearcher(idx_dir)
    docs, npos, *_ = s._term_rows("hash")
    assert int(row.n) == docs.size
    assert int(row.total) == int(npos.sum())


def test_positions_append_equals_rebuild(spark, tmp_path):
    """Appending new docs (fresh ids) to the positional table must be
    indistinguishable from rebuilding over the union corpus."""
    rng = random.Random(31)
    a = _random_corpus(rng, 60)
    b = _random_corpus(rng, 40)
    b["doc_id"] = b["doc_id"] + 1000  # disjoint id space
    inc_dir = os.path.join(str(tmp_path), "idx_inc")
    full_dir = os.path.join(str(tmp_path), "idx_full")
    build_positions(spark, spark.createDataFrame(a), inc_dir,
                    n_buckets=4, stem=False)
    build_positions(spark, spark.createDataFrame(b), inc_dir,
                    n_buckets=4, stem=False, mode="append")
    build_positions(
        spark, spark.createDataFrame(pd.concat([a, b])), full_dir,
        n_buckets=4, stem=False,
    )
    s_inc = PhraseSearcher(inc_dir)
    s_full = PhraseSearcher(full_dir)
    for _ in range(10):
        phrase = [rng.choice(VOCAB) for _ in range(rng.randint(1, 3))]
        assert s_inc.phrase_counts(phrase) == s_full.phrase_counts(phrase)
    with pytest.raises(ValueError):
        build_positions(spark, spark.createDataFrame(b), inc_dir,
                        n_buckets=8, stem=False, mode="append")


# ---------------------------------------------------------------------------
# dup-ngram quality
# ---------------------------------------------------------------------------

def test_dup_ngram_stats_vs_reference(spark):
    texts = {
        10: "a b a b a b",       # heavy bigram repetition
        11: "a b c d e f",       # all distinct
        12: "x x x x",           # total repetition
        13: "a b",               # < 3 tokens -> dropped
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {int(r.doc_id): r.asDict() for r in dup_ngram_stats(df).collect()}
    assert set(got) == {10, 11, 12}

    def ref(t, n):
        w = t.split(" ")
        grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        return len(grams), round(1.0 - len(set(grams)) / len(grams), 6)

    for d, t in texts.items():
        if len(t.split(" ")) < 3:
            continue
        n2, f2 = ref(t, 2)
        n3, f3 = ref(t, 3)
        assert got[d]["n_bigrams"] == n2
        assert got[d]["dup_bigram_frac"] == pytest.approx(f2)
        assert got[d]["n_trigrams"] == n3
        assert got[d]["dup_trigram_frac"] == pytest.approx(f3)


# ---------------------------------------------------------------------------
# filter-clause restrict on the positional paths (site:/ts-window)
# ---------------------------------------------------------------------------

def test_phrase_restrict_equals_postfilter(spark, tmp_path):
    """restrict= on search_phrase / phrase_counts / near is an
    allow-list applied at candidate generation — results must equal
    the unrestricted run filtered post-hoc (removal-only commutes
    with ranking), on the pruned AND exhaustive-order paths, and the
    distributed semi-join twin must agree."""
    rng = random.Random(77)
    pdf = _random_corpus(rng, 120)
    idx_dir = os.path.join(str(tmp_path), "idx_restrict")
    build_positions(
        spark, spark.createDataFrame(pdf), idx_dir, n_buckets=4,
        stem=False,
    )
    s = PhraseSearcher(idx_dir)
    allow = sorted(int(d) for d in pdf.doc_id if d % 3 != 1)
    aset = set(allow)
    for phrase in (["spark"], ["hash", "table"], ["spark", "join"]):
        full = s.phrase_counts(phrase)
        want_counts = [(d, tf) for d, tf in full if d in aset]
        got_counts = s.phrase_counts(phrase, restrict=allow)
        assert got_counts == want_counts, phrase

        want_top = sorted(want_counts, key=lambda r: (-r[1], r[0]))[:10]
        got_top = s.search_phrase(phrase, k=10, restrict=allow)
        assert got_top == want_top, phrase

        from search_engine_spark.plans.positions import (
            phrase_search_distributed,
        )

        rdf = spark.createDataFrame([(d,) for d in allow],
                                    "doc_id long")
        got_dist = [
            (r.doc_id, r.phrase_tf)
            for r in phrase_search_distributed(
                spark, idx_dir, phrase, k=10, restrict=rdf
            ).collect()
        ]
        assert got_dist == want_top, phrase
    # empty allow-list matches nothing
    assert s.search_phrase(["spark"], k=5, restrict=[]) == []
    assert s.phrase_counts(["spark"], restrict=[]) == []
    # near path rides the same argument
    near_full = s.near_counts("spark", "join", 4)
    want_near = [(d, dist) for d, dist in near_full if d in aset]
    assert s.near_counts("spark", "join", 4, restrict=allow) == want_near
