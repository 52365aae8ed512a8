"""Pure-Python replication of Spark's ``xxhash64`` over int literals.

XXH64 is a public algorithm (Yann Collet's xxHash, BSD — the same spec
Spark's ``org.apache.spark.sql.catalyst.expressions.XxHash64`` implements).
Spark folds a multi-column call left-to-right: the running hash seeds the
next column, starting from the expression's seed (42 for ``F.xxhash64``),
and an ``IntegerType`` input takes the 4-byte path.

Why this exists: the engine's production hyperplane-LSH buckets derive their
±1 plane components from ``xxhash64(seed, p, j) & 1`` on executors
(similarity.bucket_expr's non-portable branch).  DuckDB cannot evaluate
Spark's xxhash64, but the plane table is a FIXED n_planes × dim grid of int
triples — so replicating the int path here lets an oracle embed the exact
same ±1 literals and hash-match the production branch end-to-end (round-2
verdict item 10).  A pytest cross-checks this module against Spark's own
``F.xxhash64`` over a value grid.
"""

from __future__ import annotations

from typing import List, Sequence

_PRIME64_1 = 0x9E3779B185EBCA87
_PRIME64_2 = 0xC2B2AE3D27D4EB4F
_PRIME64_3 = 0x165667B19E3779F9
_PRIME64_4 = 0x85EBCA77C2B2AE63
_PRIME64_5 = 0x27D4EB2F165667C5
_MASK64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _PRIME64_2) & _MASK64
    h ^= h >> 29
    h = (h * _PRIME64_3) & _MASK64
    h ^= h >> 32
    return h


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte int (the IntegerType path), unsigned result."""
    seed &= _MASK64
    h = (seed + _PRIME64_5 + 4) & _MASK64
    k = (value & 0xFFFFFFFF) * _PRIME64_1 & _MASK64
    h ^= k
    h = (_rotl(h, 23) * _PRIME64_2 + _PRIME64_3) & _MASK64
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte long (the LongType path), unsigned result."""
    seed &= _MASK64
    h = (seed + _PRIME64_5 + 8) & _MASK64
    k = _rotl((value & _MASK64) * _PRIME64_2 & _MASK64, 31) * _PRIME64_1
    h ^= k & _MASK64
    h = (_rotl(h, 27) * _PRIME64_1 + _PRIME64_4) & _MASK64
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_ints(values: Sequence[int], seed: int = 42) -> int:
    """``F.xxhash64(F.lit(v0), F.lit(v1), ...)`` for Python ints that lower
    to IntegerType literals — signed 64-bit, exactly Spark's result."""
    h = seed
    for v in values:
        h = xxh64_int(v, h)
    return _signed(h)


def xxhash64_planes(
    n_planes: int, dim: int, seed: int = 42
) -> List[List[float]]:
    """The ±1 hyperplane components the PRODUCTION bucket_expr branch
    computes on executors (similarity.py: xxhash64(seed, p, j) & 1), as
    driver-side literals an oracle can embed."""
    return [
        [
            1.0 if spark_xxhash64_ints([seed, p, j]) & 1 == 1 else -1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]
