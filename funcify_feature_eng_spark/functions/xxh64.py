"""Pure-Python XXH64 compatible with Spark's ``xxhash64`` expression.

Used ONLY to generate independent oracle fixtures for the hash-dependent
dedup operators (MinHash LSH, SimHash): the driver's DuckDB gate cannot
compute Spark's xxhash64, so expected pairs are precomputed here — a
from-scratch implementation of the public XXH64 algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash — BSD, algorithm spec is public) plus
Spark's per-type composition rules (``XxHash64Function`` semantics:
IntegerType hashes the 4-byte value, LongType the 8-byte value, StringType
the UTF-8 bytes; multi-argument calls chain each element's hash as the seed
of the next; default seed 42).

``tests/test_xxh64.py`` locks this implementation against Spark itself.
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * P2) & _M, 31) * P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * P1 + P4) & _M


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed
        v4 = (seed - P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark XxHash64Function.hashInt: the 4-byte little-endian tail path."""
    seed &= _M
    h = (seed + P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * P1) & _M
    h = (_rotl(h, 23) * P2 + P3) & _M
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XxHash64Function.hashLong: the 8-byte stripe tail path."""
    seed &= _M
    h = (seed + P5 + 8) & _M
    h ^= _round(0, value & _M)
    h = (_rotl(h, 27) * P1 + P4) & _M
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*values, seed: int = SPARK_DEFAULT_SEED) -> int:
    """Replicate ``F.xxhash64(*cols)``: chain each argument's hash as the
    seed of the next; returns Spark's SIGNED long. Accepts python int
    (width must be disambiguated via a ('int'|'long', value) tuple when it
    matters — bare ints are treated as Spark IntegerType if they fit in 32
    signed bits is WRONG for longs, so bare ints here mean LongType only
    when tagged), str, or bytes.
    """
    h = seed & _M
    for v in values:
        if isinstance(v, tuple):
            kind, val = v
            if kind == "int":
                h = xxh64_int(val, h)
            elif kind == "long":
                h = xxh64_long(val, h)
            else:
                raise TypeError(f"unknown tagged kind {kind!r}")
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, bytes):
            h = xxh64_bytes(v, h)
        else:
            raise TypeError(
                "ambiguous bare int — pass ('int', v) or ('long', v) to pick "
                "the Spark-type hash path"
            )
    return _to_signed(h)
