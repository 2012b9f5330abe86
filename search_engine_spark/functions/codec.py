"""Posting-segment compression: delta-gap doc_ids + LEB128 varints.

SURVEY.md A7 / BASELINE.json north_star: posting lists are stored as
"delta-gap + varint-compressed" segments. There is no Spark builtin for
this (SURVEY.md section 4), so it is a numpy-vectorized codec used
inside Arrow-batched UDFs — never per-row Python.

Encoding: unsigned LEB128 (7 data bits per byte, high bit = continue).
doc_ids within a segment are sorted ascending and stored as
first-value + gaps (gap >= 1 because doc_ids are distinct per term);
tfs are stored as raw varints (tf >= 1).

Both directions are fully vectorized: encode computes per-value byte
lengths then fills one byte-plane at a time; decode segments the byte
stream on terminator bytes (high bit clear) and accumulates 7-bit
limbs with cumulative group arithmetic. Roundtrip is property-tested
(tests/test_codec.py, hypothesis-style randomized).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64-bit values need at most ceil(64/7) = 10 bytes


def _encode_varints_raw(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Shared LEB128 encoder core: returns (byte array, per-value byte
    offsets of length n+1) for a uint64 array."""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= np.uint64(1)
        nz = tmp > 0
    nbytes = np.maximum((nbits + 6) // 7, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    tmp = v.copy()
    remaining = nbytes.copy()
    pos = offsets[:-1].copy()
    plane = 0
    while (remaining > 0).any():
        live = remaining > 0
        b = (tmp[live] & np.uint64(0x7F)).astype(np.uint8)
        cont = (remaining[live] > 1).astype(np.uint8) << 7
        out[pos[live] + plane] = b | cont
        tmp[live] >>= np.uint64(7)
        remaining[live] -= 1
        plane += 1
        if plane > _MAX_VARINT_BYTES:  # pragma: no cover - safety
            raise ValueError("varint overflow")
    return out, offsets


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64/int64 array (all values must be >= 0)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    out, _ = _encode_varints_raw(v)
    return out.tobytes()


def encode_varints_runs(values: np.ndarray, run_starts: np.ndarray) -> list[bytes]:
    """LEB128-encode a CONCATENATED array of runs in ONE vectorized
    pass, then slice one blob per run. Equivalent to (but ~100x less
    per-call overhead than) calling encode_varints per run — the
    SPIMI partial builder encodes millions of tiny runs per build."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return [b""] * max(len(run_starts), 0)
    out, offsets = _encode_varints_raw(v)
    buf = out.tobytes()
    bounds = np.append(run_starts, v.size)
    return [
        buf[int(offsets[bounds[i]]):int(offsets[bounds[i + 1]])]
        for i in range(len(run_starts))
    ]


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte string back to a uint64 array.

    Byte-PLANE decode: at most ceil(64/7)=10 vectorized gather passes
    (one per possible limb position), each `vals |= limb << 7p` over
    the still-live groups. This replaces the earlier np.add.at scatter
    (element-at-a-time ufunc.at, ~10x slower on multi-MB buffers —
    measured on the hot-term positional decode)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (raw & 0x80) == 0
    ends = np.flatnonzero(is_end)
    n = ends.size
    group_starts = np.empty(n, dtype=np.int64)
    group_starts[0] = 0
    group_starts[1:] = ends[:-1] + 1
    group_len = ends - group_starts + 1
    vals = np.zeros(n, dtype=np.uint64)
    data = (raw & 0x7F).astype(np.uint64)
    max_len = int(group_len.max())
    live = np.arange(n, dtype=np.int64)
    starts = group_starts
    lens = group_len
    for p in range(max_len):
        if p > 0:
            keep = lens > p
            live = live[keep]
            starts = starts[keep]
            lens = lens[keep]
        vals[live] |= data[starts + p] << np.uint64(7 * p)
    return vals


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Compress one posting segment.

    doc_ids must be strictly increasing (sorted, distinct per term —
    guaranteed by the (term, doc_id) sort upstream, SURVEY.md O1).
    Returns (doc_id_blob, tf_blob).
    """
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if d.size and not (np.diff(d) > 0).all():
        raise ValueError("doc_ids must be strictly increasing")
    gaps = np.empty_like(d)
    if d.size:
        gaps[0] = d[0]
        np.subtract(d[1:], d[:-1], out=gaps[1:])
    return (
        encode_varints(gaps.astype(np.uint64)),
        encode_varints(np.ascontiguousarray(tfs, dtype=np.uint64)),
    )


def decode_postings(doc_blob: bytes, tf_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decompress one segment -> (doc_ids int64 asc, tfs int64)."""
    gaps = decode_varints(doc_blob).astype(np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = decode_varints(tf_blob).astype(np.int64)
    return doc_ids, tfs


def encode_postings_runs(
    doc_ids: np.ndarray, tfs: np.ndarray, run_starts: np.ndarray,
) -> tuple[list[bytes], list[bytes]]:
    """encode_postings for MANY runs at once: doc_ids/tfs are the
    concatenation of the runs, run_starts their start indices. doc_ids
    must be strictly increasing WITHIN each run. One vectorized
    delta-gap + LEB128 pass; per-run blobs sliced out at the end."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    starts = np.asarray(run_starts, dtype=np.int64)
    gaps = np.empty_like(d)
    if d.size:
        gaps[0] = d[0]
        np.subtract(d[1:], d[:-1], out=gaps[1:])
        gaps[starts] = d[starts]  # run firsts are stored absolute
        interior = np.ones(d.size, dtype=bool)
        interior[starts] = False
        if not (gaps[interior] > 0).all():
            raise ValueError("doc_ids must be strictly increasing per run")
    return (
        encode_varints_runs(gaps.astype(np.uint64), starts),
        encode_varints_runs(
            np.ascontiguousarray(tfs, dtype=np.uint64), starts
        ),
    )


def rebase_first_docs(blobs: list[bytes], offset: int) -> list[bytes]:
    """Shift every doc_id in each posting blob by `offset` WITHOUT
    decoding the blob: only the FIRST varint stores an absolute doc_id
    (the rest are gaps, which a constant shift leaves unchanged), so
    rebasing a segment is decode-one-varint + re-encode-one-varint +
    byte concat. This is what makes the tiered merge's segment append
    O(segments), not O(postings) (plans/merge.py)."""
    firsts = np.empty(len(blobs), dtype=np.uint64)
    tails: list[int] = []  # byte index just past the first varint
    for r, b in enumerate(blobs):
        if not b:  # empty segment blob: nothing to rebase
            firsts[r] = 0
            tails.append(0)
            continue
        i = 0
        v = 0
        while b[i] & 0x80:
            v |= (b[i] & 0x7F) << (7 * i)
            i += 1
        v |= (b[i] & 0x7F) << (7 * i)
        firsts[r] = v
        tails.append(i + 1)
    new_firsts = encode_varints_runs(
        firsts + np.uint64(offset),
        np.arange(len(blobs), dtype=np.int64),
    )
    return [nf + b[t:] if b else b for nf, b, t in zip(new_firsts, blobs, tails)]


def decode_varints_concat(blobs: list[bytes],
                          counts: np.ndarray) -> np.ndarray:
    """Decode many varint blobs in ONE pass: returns the concatenated
    value array (counts[i] values per blob, validated)."""
    vals = decode_varints(b"".join(blobs))
    if vals.size != int(np.sum(counts)):
        raise ValueError("blob value counts do not match")
    return vals


def decode_postings_concat(
    doc_blobs: list[bytes], tf_blobs: list[bytes], counts: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """decode_postings for MANY segments at once -> (doc_ids, tfs,
    run_starts); the per-run gap cumsum is reset via one vectorized
    prefix-subtraction instead of a Python call per segment."""
    counts = np.asarray(counts, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    gaps = decode_varints_concat(doc_blobs, counts).astype(np.int64)
    csum = np.cumsum(gaps)
    # subtract each run's exclusive prefix so cumsum restarts per run
    prefix = np.where(starts > 0, csum[starts - 1], 0)
    docs = csum - np.repeat(prefix, counts)
    tfs = decode_varints_concat(tf_blobs, counts).astype(np.int64)
    return docs, tfs, starts
