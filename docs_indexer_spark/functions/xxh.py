"""Pure-Python XXH64 — bit-identical to Spark's ``xxhash64`` (seed 42).

The engine's term ids are ``xxhash64(term)`` by construction
(operators/postings.term_dictionary), so query paths need term→id
hashing at plan-build time.  Doing it driver-side removes the 1-row
Spark job every probe used to run just to evaluate ``xxhash64(lit)``
(20-40 ms of fixed latency per query).  XXH64 is a public, stable
algorithm; equality with Spark's implementation over the whole corpus
vocabulary plus multi-byte/unicode edge cases is pinned by
tests/test_token_relations.py::test_python_xxh64_matches_spark.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            l0 = int.from_bytes(data[i:i + 8], "little")
            l1 = int.from_bytes(data[i + 8:i + 16], "little")
            l2 = int.from_bytes(data[i + 16:i + 24], "little")
            l3 = int.from_bytes(data[i + 24:i + 32], "little")
            v1 = (_rotl((v1 + l0 * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + l1 * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + l2 * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + l3 * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = (h ^ ((_rotl((v * _P2) & _M, 31) * _P1) & _M)) & _M
            h = (((h * _P1) & _M) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h = (h ^ ((_rotl((k * _P2) & _M, 31) * _P1) & _M)) & _M
        h = (((_rotl(h, 27) * _P1) & _M) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (h ^ ((int.from_bytes(data[i:i + 4], "little") * _P1) & _M)) & _M
        h = (((_rotl(h, 23) * _P2) & _M) + _P3) & _M
        i += 4
    while i < n:
        h = (h ^ ((data[i] * _P5) & _M)) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h = (h ^ (h >> 33)) & _M
    h = (h * _P2) & _M
    h = (h ^ (h >> 29)) & _M
    h = (h * _P3) & _M
    h = (h ^ (h >> 32)) & _M
    return h


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """SIGNED 64-bit value equal to Spark's ``xxhash64(s)`` for a string
    column (UTF-8 bytes, default seed 42)."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h
