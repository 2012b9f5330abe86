"""Varint/delta codec roundtrip properties (SURVEY.md 5.1, FIXTURES 5)."""

import numpy as np
import pytest

from search_engine_spark.functions.codec import (
    decode_postings,
    decode_varints,
    encode_postings,
    encode_varints,
)


def test_empty():
    assert encode_varints(np.array([], dtype=np.uint64)) == b""
    assert decode_varints(b"").size == 0


def test_single_values():
    for v in [0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1, 2**64 - 1]:
        arr = np.array([v], dtype=np.uint64)
        assert decode_varints(encode_varints(arr)).tolist() == [v]


def test_known_bytes():
    # LEB128: 300 = 0b100101100 -> 0xAC 0x02
    assert encode_varints(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert encode_varints(np.array([0], dtype=np.uint64)) == b"\x00"
    assert encode_varints(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varints(np.array([128], dtype=np.uint64)) == b"\x80\x01"


@pytest.mark.parametrize("seed", range(8))
def test_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 5000))
    vals = rng.integers(0, 2**62, size=n, dtype=np.int64).astype(np.uint64)
    # mix in small values (the common case for gaps/tfs)
    small = rng.integers(0, 200, size=n, dtype=np.int64).astype(np.uint64)
    mask = rng.random(n) < 0.7
    vals[mask] = small[mask]
    out = decode_varints(encode_varints(vals))
    assert np.array_equal(out, vals)


@pytest.mark.parametrize("seed", range(8))
def test_postings_roundtrip(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 4096))
    doc_ids = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 1000, size=n).astype(np.int64)
    dblob, tblob = encode_postings(doc_ids, tfs)
    d2, t2 = decode_postings(dblob, tblob)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)


def test_postings_adversarial():
    # single element
    d, t = encode_postings(np.array([42]), np.array([1]))
    dd, tt = decode_postings(d, t)
    assert dd.tolist() == [42] and tt.tolist() == [1]
    # max gaps
    ids = np.array([0, 2**40, 2**41], dtype=np.int64)
    d, t = encode_postings(ids, np.array([1, 1, 1]))
    assert decode_postings(d, t)[0].tolist() == ids.tolist()
    # tf=1 runs compress to one byte each
    ids = np.arange(1000, dtype=np.int64)
    d, t = encode_postings(ids, np.ones(1000, dtype=np.int64))
    assert len(t) == 1000
    assert len(d) == 1000  # gaps of 1 after first value (0)


def test_unsorted_rejected():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 1, 2]), np.array([1, 1, 1]))


def test_compression_wins():
    # dense doc_ids: varint+delta must be ~1 byte/posting vs 8 raw
    ids = np.arange(0, 100000, 3, dtype=np.int64)
    d, _ = encode_postings(ids, np.ones(ids.size, dtype=np.int64))
    assert len(d) < ids.size * 2


def test_python_xxhash64_matches_jvm(spark):
    """Driver-side XXH64 must be bit-identical to F.xxhash64 (seed 42)
    on a fuzzed vocabulary incl. empty, long (>32B stripes), and
    multibyte UTF-8 strings — it routes query terms to index buckets."""
    import random
    import string

    from pyspark.sql import functions as F

    from search_engine_spark.functions.hashing import term_bucket, xxhash64

    rng = random.Random(13)
    words = [""]
    for _ in range(150):
        n = rng.randrange(0, 80)
        words.append("".join(rng.choice(string.printable[:94]) for _ in range(n)))
    for _ in range(50):
        n = rng.randrange(1, 40)
        words.append("".join(chr(rng.randrange(0x20, 0x2FFF)) for _ in range(n)))
    words = list(dict.fromkeys(words))
    df = spark.createDataFrame([(w,) for w in words], "t string")
    jvm = {
        r.t: (r.h, r.b)
        for r in df.select(
            "t",
            F.xxhash64("t").alias("h"),
            F.pmod(F.xxhash64("t"), F.lit(64)).cast("int").alias("b"),
        ).collect()
    }
    for w in words:
        h, b = jvm[w]
        assert xxhash64(w.encode("utf-8")) == h, w
        assert term_bucket(w, 64) == b, w


@pytest.mark.parametrize("seed", range(4))
def test_rebase_first_docs(seed):
    """Segment rebase (tiered merge): shifting only the first varint
    moves EVERY decoded doc_id by the offset — including 1-posting
    segments and multi-byte boundary crossings."""
    from search_engine_spark.functions.codec import rebase_first_docs

    rng = np.random.default_rng(200 + seed)
    blobs, wants, offset = [], [], int(rng.integers(1, 10**12))
    for _ in range(50):
        n = int(rng.integers(1, 300))
        docs = np.sort(
            rng.choice(10**8, size=n, replace=False)
        ).astype(np.int64)
        tfs = np.ones(n, dtype=np.int64)
        dblob, _ = encode_postings(docs, tfs)
        blobs.append(dblob)
        wants.append(docs + offset)
    # boundary values: first doc 0 (1-byte varint) and 127/128
    for first in (0, 127, 128, 2**28 - 1):
        docs = np.asarray([first, first + 1, first + 1000], dtype=np.int64)
        dblob, _ = encode_postings(docs, np.ones(3, dtype=np.int64))
        blobs.append(dblob)
        wants.append(docs + offset)
    blobs.append(b"")
    out = rebase_first_docs(blobs, offset)
    assert out[-1] == b""
    for blob, want in zip(out[:-1], wants):
        got = np.cumsum(decode_varints(blob).astype(np.int64))
        assert np.array_equal(got, want)
