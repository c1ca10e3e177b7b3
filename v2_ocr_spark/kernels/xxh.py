"""Pure-Python xxHash64 — the oracle twin of Spark's ``xxhash64``.

Spark's built-in ``xxhash64(col)`` hashes a string column's UTF-8 bytes
with the public XXH64 algorithm (Cyan4973/xxHash, public-domain spec)
at seed 42. DuckDB has no xxhash, so expected-parquet oracle twins for
operators whose output embeds these hash values (simhash_64) recompute
them here, independently of the JVM. Pinned byte-for-byte against
``F.xxhash64`` in tests/test_oracle_expected.py (empty string, unicode,
and all tail-length classes: <4, 4-7, 8-31, >=32 bytes).

This is NOT a hot-path kernel — fixture/oracle generation only. The
production hash stays Spark's JVM-side implementation.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` -> unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (((h ^ k) * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        h = ((_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 as the signed int64 Spark's ``xxhash64`` column carries."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed XXH64 of a string's UTF-8 bytes — ``F.xxhash64(string_col)``."""
    return xxh64_signed(s.encode("utf-8"), seed)


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Signed XXH64 of a LongType column value — ``F.xxhash64(long_col)``.

    Spark's XxHash64Function.hashLong processes the long as one 8-byte
    little-endian stripe (n=8 short-input path), which is exactly
    XXH64 of the value's 8 LE bytes. Pinned against F.xxhash64 on a
    bigint column in tests/test_oracle_expected.py.
    """
    return xxh64_signed((v & _M).to_bytes(8, "little"), seed)
