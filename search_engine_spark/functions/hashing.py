"""Driver-side xxHash64 matching Spark's `F.xxhash64` bit-for-bit.

XXH64 is a published spec (Yann Collet's xxHash, BSD); Spark's
Catalyst XxHash64 expression applies it to the UTF-8 bytes of a string
with seed 42. Reimplementing it here lets query-time term->bucket
routing (`pmod(xxhash64(term), n_buckets)`, the index's physical
layout key from plans/build_index._bucket_expr) run as local
arithmetic instead of a Spark job per query — a ~100 ms scheduling
floor removed from every distributed lookup, and the enabler for the
LocalSearcher's lazy dictionary. Equality with the JVM is fuzz-tested
in tests/test_codec.py::test_python_xxhash64_matches_jvm.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxhash64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of `data`, returned as a SIGNED 64-bit int (Spark long)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h = (h * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket(term: str, n_buckets: int) -> int:
    """The index's bucket for `term`: pmod(xxhash64(term), n_buckets),
    identical to plans/build_index._bucket_expr. Python's % already has
    pmod (non-negative) semantics for a positive modulus."""
    return xxhash64(term.encode("utf-8")) % n_buckets
