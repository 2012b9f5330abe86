"""Index integrity checker (plans/fsck + index_admin.py fsck CLI).

A clean index passes every invariant; targeted corruptions are
detected: dictionary df drift (I1), duplicated postings — the
round-1 extend-offset bug class (I2), dangling tombstones (I5).
"""

import glob
import json
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_spark.plans.build_index import build_index
from search_engine_spark.plans.fsck import fsck
from search_engine_spark.plans.positions import build_positions

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _drop_crc(frag: str) -> None:
    # rewriting a Spark-written fragment in place invalidates Hadoop's
    # .crc sidecar; Spark reads would then fail on ChecksumException
    # instead of reaching the invariant under test
    crc = os.path.join(os.path.dirname(frag),
                       "." + os.path.basename(frag) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)


@pytest.fixture()
def index_dir(spark, documents, tmp_path_factory):
    # function-scoped: corruption tests mutate their copy
    d = str(tmp_path_factory.mktemp("index_fsck"))
    build_index(spark, documents, d, n_buckets=4, segment_size=64,
                stem=False, salt_threshold=100, max_salts=4)
    build_positions(spark, documents, d, n_buckets=4, stem=False)
    return d


def test_clean_index_passes(index_dir):
    out = fsck(index_dir, sample_terms=50)
    assert out["ok"], out["errors"]
    assert out["terms_checked"] > 0  # full vocab if smaller than sample
    assert out["positions_terms_checked"] > 0


def test_boosts_checked(spark, index_dir):
    """I8: a static boost table with negative values or duplicate
    doc_ids must fail fsck — serving's block-max bound assumes
    boost >= 0 and a unique per-doc prior."""
    import os

    spark.createDataFrame(
        [(0, 1.0), (1, 0.5)], "doc_id long, boost double"
    ).write.parquet(os.path.join(index_dir, "boosts"))
    out = fsck(index_dir, sample_terms=20)
    assert out["boosts_checked"] and out["ok"], out["errors"]

    spark.createDataFrame(
        [(0, -1.0), (1, 0.5), (1, 0.7)], "doc_id long, boost double"
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "boosts"))
    out = fsck(index_dir, sample_terms=20)
    assert not out["ok"]
    assert any("I8" in e and "negative" in e for e in out["errors"])
    assert any("I8" in e and "duplicate" in e for e in out["errors"])


def test_detects_df_drift(index_dir):
    # bump one term's dictionary df by 1 in its bucket fragment
    frag = sorted(glob.glob(
        os.path.join(index_dir, "dictionary", "bucket=*", "*.parquet")
    ))[0]
    tbl = pq.read_table(frag)
    df = tbl["df"].to_pylist()
    df[0] += 1
    victim = tbl["term"][0].as_py()
    pq.write_table(
        tbl.set_column(tbl.schema.get_field_index("df"), "df",
                       pa.array(df, type=tbl["df"].type)),
        frag,
    )
    out = fsck(index_dir, sample_terms=10**6)  # sample everything
    assert not out["ok"]
    assert any("I1" in e and repr(victim) in e for e in out["errors"]), \
        out["errors"][:5]


def test_fsck_recurses_into_title_field(spark, tmp_path_factory):
    """Round 3: fields/title is audited by the same invariants — a
    clean two-field index passes with fields_checked=['title'], and a
    df corruption INSIDE the title dictionary fails the parent fsck."""
    from search_engine_spark.operators.dedup import latest_snapshot
    from search_engine_spark.operators.ids import assign_dense_ids
    from search_engine_spark.plans.multifield import build_title_index
    from search_engine_spark.sources.pages import generate_pages

    d = str(tmp_path_factory.mktemp("index_fsck_title"))
    corpus = assign_dense_ids(
        latest_snapshot(generate_pages(spark, 200, partitions=2)), "url"
    )
    build_index(spark, corpus, d, n_buckets=4, segment_size=64,
                stem=False, html_col="html")
    build_title_index(spark, corpus, d, n_buckets=2, stem=False)

    out = fsck(d, sample_terms=40)
    assert out["ok"], out["errors"]
    assert out["fields_checked"] == ["title"]

    frag = sorted(glob.glob(
        os.path.join(d, "fields", "title", "dictionary",
                     "bucket=*", "*.parquet")
    ))[0]
    tbl = pq.read_table(frag)
    df = tbl["df"].to_pylist()
    df[0] += 1
    pq.write_table(
        tbl.set_column(tbl.schema.get_field_index("df"), "df",
                       pa.array(df, type=tbl["df"].type)),
        frag,
    )
    out = fsck(d, sample_terms=10**6)
    assert not out["ok"]
    assert any("I7 field index 'title'" in e for e in out["errors"]), \
        out["errors"][:5]


def test_detects_duplicate_postings(index_dir):
    # simulate the extend-offset bug: a postings file duplicated into
    # its bucket dir duplicates every (term, doc_id) it holds
    frag = sorted(glob.glob(
        os.path.join(index_dir, "postings", "bucket=*", "*.parquet")
    ))[0]
    shutil.copy(frag, frag.replace(".parquet", "-dup.parquet"))
    out = fsck(index_dir, sample_terms=10**6)
    assert not out["ok"]
    assert any("I2" in e for e in out["errors"]), out["errors"][:5]


def test_detects_dangling_tombstone(index_dir):
    # fake urlmap + a tombstone pointing at a doc id that never existed
    os.makedirs(os.path.join(index_dir, "urlmap"), exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "url": pa.array(["a", "b", "c"])}),
        os.path.join(index_dir, "urlmap", "part-0.parquet"),
    )
    os.makedirs(os.path.join(index_dir, "deletes"), exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 10**9], type=pa.int64())}),
        os.path.join(index_dir, "deletes", "part-0.parquet"),
    )
    out = fsck(index_dir, sample_terms=5)
    assert out["tombstones_checked"]
    assert any("I5" in e and str(10**9) in e for e in out["errors"])
    assert not any(" 1 not in urlmap" in e for e in out["errors"])


def test_distributed_clean(spark, index_dir):
    from search_engine_spark.plans.fsck import fsck_distributed

    out = fsck_distributed(spark, index_dir)
    assert out["ok"], out["errors"]
    assert out["terms_checked"] > 0
    assert out["postings_checked"] > 0


def test_distributed_detects_duplicates(spark, index_dir):
    from search_engine_spark.plans.fsck import fsck_distributed

    frag = sorted(glob.glob(
        os.path.join(index_dir, "postings", "bucket=*", "*.parquet")
    ))[0]
    shutil.copy(frag, frag.replace(".parquet", "-dup.parquet"))
    out = fsck_distributed(spark, index_dir)
    assert not out["ok"]
    assert out["bad_terms"] > 0
    assert any("I1/I2" in e for e in out["errors"])


def test_cli_exit_codes(index_dir):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "index_admin.py"), "fsck",
         "--index-dir", index_dir, "--sample", "20"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert json.loads(r.stdout.strip().splitlines()[-1])["ok"] is True
    # corrupt, expect exit 1
    frag = sorted(glob.glob(
        os.path.join(index_dir, "postings", "bucket=*", "*.parquet")
    ))[0]
    shutil.copy(frag, frag.replace(".parquet", "-dup.parquet"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "index_admin.py"), "fsck",
         "--index-dir", index_dir, "--sample", "1000000"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 1


def test_distributed_detects_position_mismatch(spark, index_dir):
    """Round-4: fsck --distributed now audits the positional table at
    FULL coverage (every (term, doc): npos == tf) — a single corrupted
    npos fails the audit."""
    from search_engine_spark.plans.fsck import fsck_distributed

    out = fsck_distributed(spark, index_dir)
    assert out["ok"], out["errors"]
    assert out["positions_checked"] > 0

    frag = sorted(glob.glob(
        os.path.join(index_dir, "positions", "bucket=*", "*.parquet")
    ))[0]
    tbl = pq.read_table(frag)
    npos = tbl["npos"].to_pylist()
    npos[0] += 1
    pq.write_table(
        tbl.set_column(tbl.schema.get_field_index("npos"), "npos",
                       pa.array(npos, type=tbl["npos"].type)),
        frag,
    )
    _drop_crc(frag)
    out = fsck_distributed(spark, index_dir)
    assert not out["ok"]
    assert any("I7 positions" in e for e in out["errors"]), out["errors"][:5]


def test_distributed_recurses_into_title_field(spark, tmp_path_factory):
    """Round-4: the distributed audit recurses into fields/* — a df
    corruption inside the title dictionary fails the parent audit."""
    from search_engine_spark.operators.dedup import latest_snapshot
    from search_engine_spark.operators.ids import assign_dense_ids
    from search_engine_spark.plans.fsck import fsck_distributed
    from search_engine_spark.plans.multifield import build_title_index
    from search_engine_spark.sources.pages import generate_pages

    d = str(tmp_path_factory.mktemp("index_fsck_title_dist"))
    corpus = assign_dense_ids(
        latest_snapshot(generate_pages(spark, 200, partitions=2)), "url"
    )
    build_index(spark, corpus, d, n_buckets=4, segment_size=64,
                stem=False, html_col="html")
    build_title_index(spark, corpus, d, n_buckets=2, stem=False)

    out = fsck_distributed(spark, d)
    assert out["ok"], out["errors"]
    assert out["fields_checked"] == ["title"]

    frag = sorted(glob.glob(
        os.path.join(d, "fields", "title", "dictionary",
                     "bucket=*", "*.parquet")
    ))[0]
    tbl = pq.read_table(frag)
    df = tbl["df"].to_pylist()
    df[0] += 1
    pq.write_table(
        tbl.set_column(tbl.schema.get_field_index("df"), "df",
                       pa.array(df, type=tbl["df"].type)),
        frag,
    )
    _drop_crc(frag)
    out = fsck_distributed(spark, d)
    assert not out["ok"]
    assert any("field index 'title'" in e for e in out["errors"]), \
        out["errors"][:5]


@pytest.fixture()
def accel_index_dir(spark, documents, index_dir):
    """index_dir (postings + positions, stem=False) plus the
    phrase-acceleration bigram table (plans/bigrams.py)."""
    from search_engine_spark.plans.bigrams import build_bigrams

    build_bigrams(spark, documents, index_dir, n_buckets=4, stem=False,
                  top_terms=4)
    return index_dir


def test_bigrams_clean_both_modes(spark, accel_index_dir):
    """I9: a healthy accelerated index passes the sampled probe and
    the full distributed audit, and both report coverage."""
    from search_engine_spark.plans.fsck import fsck_distributed

    out = fsck(accel_index_dir, sample_terms=30)
    assert out["ok"], out["errors"]
    assert out["bigrams_checked"] > 0

    out = fsck_distributed(spark, accel_index_dir)
    assert out["ok"], out["errors"]
    assert out["bigram_postings_checked"] > 0


def test_detects_bigram_tf_drift(spark, accel_index_dir):
    """I9: drifted adjacency counts (the direct phrase path would
    silently mis-rank) fail BOTH audit modes — the recount against
    the positional table is the ground truth."""
    from search_engine_spark.plans.fsck import fsck_distributed

    for frag in glob.glob(os.path.join(
        accel_index_dir, "bigrams", "bucket=*", "*.parquet"
    )):
        tbl = pq.read_table(frag)
        tfs = [t + 1 for t in tbl["tf"].to_pylist()]
        pq.write_table(
            tbl.set_column(tbl.schema.get_field_index("tf"), "tf",
                           pa.array(tfs, type=tbl["tf"].type)),
            frag,
        )
        _drop_crc(frag)

    out = fsck(accel_index_dir, sample_terms=10)
    assert not out["ok"]
    assert any("I9 bigram adjacency" in e for e in out["errors"]), \
        out["errors"][:5]

    out = fsck_distributed(spark, accel_index_dir)
    assert not out["ok"]
    assert any("I9 bigram adjacency" in e for e in out["errors"]), \
        out["errors"][:5]


def test_distributed_detects_missing_and_uncovered_rows(
    spark, accel_index_dir
):
    """I9 full coverage: a hot-adjacent pair DELETED from the table
    (covered phrase queries silently empty) and a smuggled row with no
    hot endpoint both fail the distributed audit."""
    from search_engine_spark.functions.hashing import term_bucket
    from search_engine_spark.plans.fsck import fsck_distributed

    frags = sorted(glob.glob(os.path.join(
        accel_index_dir, "bigrams", "bucket=*", "*.parquet"
    )))
    frag = max(frags, key=lambda p: pq.read_metadata(p).num_rows)
    tbl = pq.read_table(frag)
    victim = tbl["term"][0].as_py()
    import pyarrow.compute as pc

    pq.write_table(tbl.filter(pc.not_equal(tbl["term"], victim)), frag)
    _drop_crc(frag)

    fake = "zzqq yyxx"  # neither endpoint hot
    bdir = os.path.join(accel_index_dir, "bigrams",
                        f"bucket={term_bucket(fake, 4)}")
    os.makedirs(bdir, exist_ok=True)
    pq.write_table(
        pa.table({
            "term": pa.array([fake]),
            "doc_id": pa.array([0], type=pa.int64()),
            "tf": pa.array([1], type=pa.int32()),
        }),
        os.path.join(bdir, "smuggled.parquet"),
    )

    out = fsck_distributed(spark, accel_index_dir)
    assert not out["ok"]
    assert any("I9 bigram adjacency" in e for e in out["errors"]), \
        out["errors"][:5]
    assert any("no hot endpoint" in e for e in out["errors"]), \
        out["errors"][:5]
