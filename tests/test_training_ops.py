"""Training-data pipeline operators: dedup family, similarity,
textstats, multimodal plumbing, streaming ingest."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from search_engine_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    make_media_table,
    rebatch_by_bytes,
)
from search_engine_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_batch,
    exact_near_dup,
    lsh_bucket_topk,
    pairwise_near_dup,
)
from search_engine_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_signals,
    token_stats,
)


@pytest.fixture(scope="module")
def dup_corpus(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
        (3, "completely different text about spark dataframes and shuffles"),
        (4, "another unrelated document mentioning window functions only"),
        (5, "the quick brown fox jumps over the lazy dog again and often"),  # near dup
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_dedup(dup_corpus):
    out = exact_dedup(dup_corpus)
    ids = {r.doc_id for r in out.collect()}
    assert 0 in ids and 1 not in ids
    assert {r.n_copies for r in out.filter(F.col("doc_id") == 0).collect()} == {2}


def test_minhash_identical_signatures(dup_corpus):
    sigs = {r.doc_id: tuple(r.sig) for r in minhash_signatures(dup_corpus).collect()}
    assert sigs[0] == sigs[1]  # identical text -> identical signature
    # near-dup shares most minhashes; unrelated shares few
    agree = lambda a, b: sum(x == y for x, y in zip(sigs[a], sigs[b]))  # noqa: E731
    assert agree(0, 2) > agree(0, 3)


def test_minhash_lsh_pairs(spark, dup_corpus):
    sigs = minhash_signatures(dup_corpus)
    pairs = {(r.a, r.b) for r in minhash_lsh_pairs(sigs).collect()}
    assert (0, 1) in pairs
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard_verify(spark, dup_corpus):
    sigs = minhash_signatures(dup_corpus)
    cand = minhash_lsh_pairs(sigs)
    verified = ngram_jaccard_pairs(dup_corpus, cand, threshold=0.99)
    got = {(r.a, r.b): r.jaccard for r in verified.collect()}
    assert got.get((0, 1)) == 1.0


def test_minhash_jvm_variant(spark, dup_corpus):
    """min-md5-string minhash (the oracle-checkable JVM path) finds the
    same planted duplicates as the kernel path."""
    from search_engine_spark.operators.dedup import minhash_lsh_pairs_jvm

    pairs = {(r.a, r.b) for r in minhash_lsh_pairs_jvm(dup_corpus).collect()}
    assert (0, 1) in pairs  # identical docs always share every band
    assert all(a < b for a, b in pairs)


def test_simhash60_jvm(dup_corpus):
    """60-bit JVM simhash: identical docs identical, near-dups closer
    than unrelated docs, value fits in 60 bits, md5-pinned."""
    import hashlib

    from search_engine_spark.operators.dedup import simhash60

    h = {r.doc_id: r.simhash for r in simhash60(dup_corpus).collect()}
    assert h[0] == h[1]
    assert all(0 <= v < (1 << 60) for v in h.values())
    ham = lambda a, b: bin(h[a] ^ h[b]).count("1")  # noqa: E731
    assert ham(0, 2) < ham(0, 3)
    # single-token doc: fingerprint IS the token's 60-bit md5 prefix
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    one = spark.createDataFrame([(9, "hello")], "doc_id long, text string")
    got = simhash60(one).collect()[0].simhash
    assert got == int(hashlib.md5(b"hello").hexdigest()[:15], 16)


def test_fingerprint_md5_portable(spark):
    import hashlib

    from search_engine_spark.operators.textstats import fingerprint_md5

    df = spark.createDataFrame(
        [(1, "a  b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    fp = {r.doc_id: r for r in fingerprint_md5(df).collect()}
    assert fp[1].fp_raw != fp[2].fp_raw
    assert fp[1].fp_norm == fp[2].fp_norm  # whitespace-normalized match
    assert fp[2].fp_raw == int(hashlib.md5(b"a b").hexdigest()[:15], 16)


def test_simhash_near_dup_distance(dup_corpus):
    h = {r.doc_id: r.simhash for r in simhash64(dup_corpus).collect()}
    assert h[0] == h[1]
    ham = lambda a, b: bin((h[a] ^ h[b]) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(0, 2) < ham(0, 3)


def test_cosine_topk_self(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    top = cosine_topk(emb, qv, k=5).collect()
    assert top[0].vec_id == 0 and top[0].cos == pytest.approx(1.0)


def test_lsh_topk_recall(spark):
    """LSH path must put the exact top-1 (self) in its bucket and keep
    reasonable recall vs brute force."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qrows = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = cosine_topk_batch(emb, qrows, k=5)
    approx = lsh_bucket_topk(emb, qrows, k=5, n_planes=6)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    # self-hit always survives LSH (identical vector -> identical bucket)
    for q in range(5):
        assert (q, q) in a
    assert len(e & a) >= 5  # at least the self-hits overlap


def test_pairwise_near_dup_self_similarity(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # duplicate a vector under a new id -> must be found as near-dup
    dup = emb.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    out = pairwise_near_dup(emb.unionByName(dup), threshold=0.999)
    assert (7, 10007) in {(r.x, r.y) for r in out.collect()}


def test_exact_near_dup_baseline_and_lsh_soundness(spark):
    """exact_near_dup is the ground truth: every LSH-found pair must be
    in it (LSH only MISSES pairs — cross-bucket — never invents them),
    and planted duplicates must be recalled by BOTH paths."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dup = emb.filter(F.col("vec_id").isin(3, 11)).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(dup)
    exact = {(r.x, r.y) for r in
             exact_near_dup(corpus, threshold=0.999).collect()}
    approx = {(r.x, r.y) for r in
              pairwise_near_dup(corpus, threshold=0.999).collect()}
    assert {(3, 10003), (11, 10011)} <= exact
    # identical vectors land in identical buckets -> LSH recalls them
    assert {(3, 10003), (11, 10011)} <= approx
    assert approx <= exact


def test_bpe_pretoken_count(spark):
    """BPE-ish subword counting: contractions split, punctuation runs
    and digit runs are units, whitespace never is."""
    from search_engine_spark.operators.textstats import token_stats

    df = spark.createDataFrame(
        [(1, "it's 42 tokens!!"), (2, ""), (3, "hello")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_subtokens)
           for r in token_stats(df).collect()}
    # "it's 42 tokens!!" -> it / 's / " 42" / " tokens" / "!!"
    assert got[1] == (3, 5)
    assert got[2] == (0, 0)
    assert got[3] == (1, 1)


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "the cat the cat"), (2, ""), (3, "unique words only here")],
        "doc_id long, text string",
    )
    ts = {r.doc_id: r for r in token_stats(df).collect()}
    assert ts[1].n_tokens == 4 and ts[2].n_tokens == 0
    assert ts[3].avg_token_len == pytest.approx((6 + 5 + 4 + 4) / 4, abs=1e-6)
    qs = {r.doc_id: r for r in quality_signals(df).collect()}
    assert qs[1].stopword_ratio == pytest.approx(0.5)
    assert qs[1].distinct_ratio == pytest.approx(0.5)
    assert qs[3].distinct_ratio == pytest.approx(1.0)


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(1, "a  b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    fp = {r.doc_id: r for r in fingerprint(df).collect()}
    assert fp[1].fp_raw != fp[2].fp_raw
    assert fp[1].fp_norm == fp[2].fp_norm  # whitespace-normalized match
    assert fp[2].fp_norm != fp[3].fp_norm


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the weather in the northern region then gets rather warm"),
            (2, "les enfants mangent ensemble dans le jardin pendant"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lang_id(df).collect()}
    assert out[1].lang_pred == "en"
    assert out[2].lang_pred == "fr"
    assert out[3].lang_pred == "und" and out[3].lang_conf == 0.0


def test_media_pipeline(spark):
    media = make_media_table(spark, 30)
    assert media.count() == 30
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.features) == 32
    # deterministic: same payload -> same features
    again = {r.media_id: list(r.features) for r in extract_features(media).collect()}
    first = {r.media_id: list(r.features) for r in feats}
    assert again == first
    frames = frame_sample_plan(media, every_ms=10000)
    assert frames.count() > 0
    assert frames.filter(F.col("frame_ts_ms") % 10000 != 0).count() == 0


def test_rebatch_by_bytes():
    import pandas as pd

    pdf = pd.DataFrame({"payload": [b"x" * 100] * 10, "i": range(10)})
    out = list(rebatch_by_bytes(iter([pdf]), "payload", max_bytes=250))
    assert sum(len(p) for p in out) == 10
    assert all(p.payload.map(len).sum() <= 300 for p in out)
    assert len(out) >= 4


def test_streaming_incremental_ingest(spark, tmp_path):
    import pandas as pd

    from search_engine_spark.streaming.incremental import start_incremental_ingest

    inp = tmp_path / "in"
    inp.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": ["spark join fast", "join slow"]}).to_parquet(
        inp / "batch1.parquet"
    )
    staging = str(tmp_path / "staging")
    q = start_incremental_ingest(
        spark, str(inp), staging, n_buckets=4, stem=False
    )
    q.awaitTermination(60)
    flat = spark.read.option("basePath", staging).parquet(staging + "/epoch=*")
    rows = {(r.term, r.doc_id): r.tf for r in flat.collect()}
    assert rows[("join", 1)] == 1 and rows[("join", 2)] == 1
    assert ("spark", 1) in rows


def test_ivf_topk_all_probes_is_exact(spark):
    """Probing every IVF cell must reproduce brute-force top-k exactly
    (the approximation comes only from skipped cells)."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.similarity import (
        cosine_topk,
        ivf_build,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, cents = ivf_build(emb, n_centroids=4)
    qv = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    exact = [(r.vec_id, r.cos) for r in cosine_topk(emb, qv, k=5).collect()]
    allp = [(r.vec_id, r.cos) for r in ivf_topk(assigned, cents, qv, k=5, nprobe=4).collect()]
    assert allp == exact
    # partial probing returns a subset of some cells, still sane
    part = [r.vec_id for r in ivf_topk(assigned, cents, qv, k=5, nprobe=2).collect()]
    assert len(part) == 5 and len(set(part) & {v for v, _ in exact}) >= 1


def test_null_text_rows_do_not_crash(spark):
    """NULL text must behave as empty text in every dedup operator —
    a single NULL row previously aborted the whole simhash job."""
    from search_engine_spark.operators.dedup import (
        minhash_lsh_pairs_jvm,
        minhash_signatures,
        simhash60,
        simhash64,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id long, text string"
    )
    s64 = {r.doc_id: r.simhash for r in simhash64(df).collect()}
    assert s64[2] == 0
    s60 = {r.doc_id: r.simhash for r in simhash60(df).collect()}
    assert s60[2] == 0
    assert len(minhash_signatures(df).collect()) == 2
    minhash_lsh_pairs_jvm(df).collect()  # no crash


def test_connected_components(spark):
    """Min-label propagation: planted clusters, singletons, and a long
    chain (diameter >> 1) all converge to the component-min label."""
    from search_engine_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (7, 8)], "a long, b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    cc = {r.doc_id: r.cluster_id
          for r in connected_components(edges, nodes).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[5] == cc[6] == 5
    assert cc[7] == cc[8] == cc[9] == 7
    assert cc[0] == 0 and cc[4] == 4  # singletons keep their own id
    # a 13-node path needs 12 propagation rounds — well under the cap
    chain = spark.createDataFrame([(i, i + 1) for i in range(12)],
                                  "a long, b long")
    nodes2 = spark.createDataFrame([(i,) for i in range(13)], "doc_id long")
    cc2 = {r.doc_id: r.cluster_id
           for r in connected_components(chain, nodes2).collect()}
    assert set(cc2.values()) == {0}


def test_asof_join(spark):
    """Point-in-time semantics: latest right row at-or-before each left
    ts per key; inclusive at equal ts; NULLs with no prior row;
    deterministic tie-break among equal-ts right rows."""
    import datetime as dt

    from search_engine_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(100, t(5), 1), (101, t(2), 1), (102, t(1), 2), (103, t(9), 9)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(1, t(2), 10, 1.0), (1, t(2), 11, 2.0), (1, t(4), 12, 3.0),
         (2, t(3), 13, 4.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = {r.event_id: (r.event_id_asof, r.value_asof)
           for r in asof_join(left, right, on="user_id", ts="ts",
                              right_cols=["event_id", "value"],
                              tiebreak="event_id").collect()}
    assert out[100] == (12, 3.0)   # latest before t=5
    assert out[101] == (11, 2.0)   # inclusive at equal ts; max tiebreak
    assert out[102] == (None, None)  # right row is later than left
    assert out[103] == (None, None)  # key with no right rows at all


def test_resize_plan(spark):
    """Aspect-preserving fit-in-box targets; no upscaling; never 0."""
    from search_engine_spark.operators.multimodal import (
        make_media_table,
        resize_plan,
    )

    out = resize_plan(make_media_table(spark, 60), max_dim=128).collect()
    assert out  # images exist
    for r in out:
        assert max(r.new_w, r.new_h) <= 128 or (r.width <= 128 and r.height <= 128)
        assert r.new_w >= 1 and r.new_h >= 1
        if r.width <= 128 and r.height <= 128:  # inside box: untouched
            assert (r.new_w, r.new_h) == (r.width, r.height)
        # aspect ratio preserved within floor rounding
        assert abs(r.new_w / r.new_h - r.width / r.height) < 0.15


def test_ann_index_layout_partition_prunes(spark, tmp_path):
    """Round-3 verdict #7: the IVF serving story is a LAYOUT —
    build writes `assigned` partitionBy(centroid); ann_query's cell
    filter shows up as hive PartitionFilters (static pruning), and
    results equal the recomputed seeded-IVF path."""
    from search_engine_spark.operators.similarity import (
        ann_query,
        build_ann_index,
        ivf_build_seeded,
        ivf_topk_seeded,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = str(tmp_path / "ann")
    summary = build_ann_index(spark, emb, d, n_centroids=6)
    assert summary["n_centroids"] == 6
    qv = [float((i * 7) % 13 - 6) / 6.0 for i in range(
        len(emb.select("embedding").first()[0])
    )]
    served = ann_query(spark, d, qv, k=5, nprobe=2)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid" in plan, plan

    assigned, cents = ivf_build_seeded(emb, n_centroids=6)
    want = [
        (r.vec_id, r.cos)
        for r in ivf_topk_seeded(assigned, cents, qv, k=5, nprobe=2).collect()
    ]
    got = [(r.vec_id, r.cos) for r in served.collect()]
    assert got == want

    # all-probes == brute-force exactness carries over to the layout
    from search_engine_spark.operators.similarity import cosine_topk

    got_all = [
        (r.vec_id, r.cos)
        for r in ann_query(spark, d, qv, k=5, nprobe=6).collect()
    ]
    brute = [(r.vec_id, r.cos) for r in cosine_topk(emb, qv, k=5).collect()]
    assert got_all == brute


def test_ann_index_kmeans_quantizer(spark, tmp_path):
    """The kmeans quantizer writes the same layout; nprobe=all is
    exact (every cell scanned — still pruned file sets per probe)."""
    from search_engine_spark.operators.similarity import (
        ann_query,
        build_ann_index,
        cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = str(tmp_path / "annk")
    build_ann_index(spark, emb, d, n_centroids=4, quantizer="kmeans")
    dim = len(emb.select("embedding").first()[0])
    qv = [1.0 if i % 3 == 0 else -0.5 for i in range(dim)]
    got = [
        (r.vec_id, r.cos)
        for r in ann_query(spark, d, qv, k=5, nprobe=4).collect()
    ]
    want = [(r.vec_id, r.cos) for r in cosine_topk(emb, qv, k=5).collect()]
    assert got == want
