"""Pure-Python XXH64 matching Spark's ``xxhash64`` (seed 42).

Why this exists: ``BucketedUpsertTable`` lays data out as
``bucket = pmod(xxhash64(bucket_key), n_buckets)`` directories. A point
read — "fetch one conversation's turns" — should touch exactly ONE of
those directories, but discovering WHICH one through Spark costs a
1-row job per lookup. This module implements the public XXH64 algorithm
(Yann Collet's spec — the same algorithm Spark's
``catalyst.expressions.XXH64`` implements and pins against the
reference test vectors in its own XXH64Suite) so the driver can compute
the bucket id with zero Spark jobs. ``table.lookup(conv_id)`` then
becomes: hash driver-side -> list ONE bucket dir -> pushed-filter
parquet scan. At 10^12 turns the point-read cost is
O(table / n_buckets), not O(table).

Parity with ``F.xxhash64`` is pinned by tests/test_lookup.py over
randomized strings (len 0..64, multi-byte UTF-8) and int/long values.

Reference behavior mirrored: the reference client's per-collection
point queries over synced state (/root/reference/pkg/client/client.go).
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """XXH64 of ``data`` as an UNSIGNED 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            lanes = struct.unpack_from("<4Q", data, i)
            v1 = _round(v1, lanes[0])
            v2 = _round(v2, lanes[1])
            v3 = _round(v3, lanes[2])
            v4 = _round(v4, lanes[3])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(value, dtype: str = "string",
                   seed: int = SPARK_XXHASH64_SEED) -> int:
    """``F.xxhash64(col)`` for one non-null value, as Spark's SIGNED
    64-bit result. ``dtype``: the Spark column type — string columns
    hash their UTF-8 bytes; byte/short/int columns hash as a 4-byte
    little-endian word, long as 8-byte (Spark's hashInt/hashLong are
    exactly XXH64 of those encodings)."""
    if dtype == "string":
        data = value.encode("utf-8")
    elif dtype in ("int", "integer", "short", "byte"):
        data = struct.pack("<i", int(value))
    elif dtype in ("long", "bigint"):
        data = struct.pack("<q", int(value))
    else:
        raise ValueError(f"unsupported dtype for driver-side xxhash64: {dtype}")
    return _signed64(xxh64(data, seed))


def spark_bucket(value, n_buckets: int, dtype: str = "string") -> int:
    """``pmod(xxhash64(value), n_buckets)`` — the bucket id Spark's
    write path assigns this key (sink.py:611). Python's ``%`` on a
    positive modulus already matches Java's pmod for negative hashes."""
    return spark_xxhash64(value, dtype) % n_buckets
