"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` (seed 42, UTF-8 bytes).

The engine hashes URLs JVM-side with the built-in ``xxhash64`` expression
(cheap, codegen'd, no Python). The synthetic-corpus generator and the pure-
Python oracle BFS need the *same* hash driver-side to compute bucket
assignments and seen-set keys without a Spark round-trip — hence this
implementation of the public XXH64 algorithm (Yann Collet, BSD).

Spark's xxhash64(col) for a StringType column hashes the UTF-8 bytes with
seed 42 and returns a *signed* 64-bit long; ``xxhash64_string`` reproduces
that exactly (verified against Spark in tests/test_hashing.py).
"""

from __future__ import annotations

_PRIME1 = 0x9E3779B185EBCA87
_PRIME2 = 0xC2B2AE3D27D4EB4F
_PRIME3 = 0x165667B19E3779F9
_PRIME4 = 0x85EBCA77C2B2AE63
_PRIME5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _PRIME2) & _MASK
    return (_rotl(acc, 31) * _PRIME1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _PRIME1 + _PRIME4) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data``; returns the unsigned 64-bit digest."""
    length = len(data)
    idx = 0
    if length >= 32:
        v1 = (seed + _PRIME1 + _PRIME2) & _MASK
        v2 = (seed + _PRIME2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _PRIME1) & _MASK
        limit = length - 32
        while idx <= limit:
            v1 = _round(v1, int.from_bytes(data[idx:idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8:idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16:idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24:idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _PRIME5) & _MASK
    h = (h + length) & _MASK
    while idx + 8 <= length:
        k1 = _round(0, int.from_bytes(data[idx:idx + 8], "little"))
        h = (_rotl(h ^ k1, 27) * _PRIME1 + _PRIME4) & _MASK
        idx += 8
    if idx + 4 <= length:
        h = (_rotl(h ^ (int.from_bytes(data[idx:idx + 4], "little") * _PRIME1) & _MASK, 23)
             * _PRIME2 + _PRIME3) & _MASK
        idx += 4
    while idx < length:
        h = (_rotl(h ^ (data[idx] * _PRIME5) & _MASK, 11) * _PRIME1) & _MASK
        idx += 1
    h ^= h >> 33
    h = (h * _PRIME2) & _MASK
    h ^= h >> 29
    h = (h * _PRIME3) & _MASK
    h ^= h >> 32
    return h


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_string(s: str, seed: int = 42) -> int:
    """Signed 64-bit hash identical to Spark's ``xxhash64(string_col)``."""
    return _to_signed(xxh64(s.encode("utf-8"), seed))


def url_bucket(url: str, num_buckets: int) -> int:
    """Bucket assignment identical to Spark's ``pmod(xxhash64(url), B)``."""
    return xxhash64_string(url) % num_buckets
