"""Iceberg partition transforms (SURVEY.md §2D; reference validation in
`partition_binder.rs:194-210`, transforms exercised by
`tests/python/tests/test_spark.py:214,244,257`).

These are the *engine-side* value transforms that power hidden
partitioning and partition pruning: a writer computes the partition
value with the same function the reader uses for pruning, so both ends
must agree bit-for-bit with the Iceberg spec:

- bucket[N]  = (murmur3_x86_32(bytes(v), seed=0) & Int.MAX) % N, where
  bytes(int/long) is the 8-byte little-endian long and bytes(string) is
  UTF-8. (Spark's built-in `hash()` is murmur3 with seed 42 and a
  different byte layout — NOT Iceberg-compatible, hence the explicit
  implementation, vectorized in numpy behind a pandas UDF.)
- truncate[W]: int/long → v - (((v % W) + W) % W); string → first W chars.
- years/months/days/hours: offsets from the Unix epoch (1970-01-01).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _murmur3_32_8bytes_le(values: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32 (seed 0) over int64 values serialized as
    8 little-endian bytes — the Iceberg spec hash for int/long/date/time/
    timestamp bucket transforms."""
    v = values.astype(np.uint64)
    c1 = np.uint32(0xCC9E2D51)
    c2 = np.uint32(0x1B873593)
    h = np.zeros(len(v), dtype=np.uint32)  # seed 0

    def rotl32(x: np.ndarray, r: int) -> np.ndarray:
        return ((x << np.uint32(r)) | (x >> np.uint32(32 - r))).astype(np.uint32)

    with np.errstate(over="ignore"):
        # two 4-byte blocks (little-endian)
        for block in (v & np.uint64(0xFFFFFFFF), v >> np.uint64(32)):
            k = block.astype(np.uint32)
            k = (k * c1).astype(np.uint32)
            k = rotl32(k, 15)
            k = (k * c2).astype(np.uint32)
            h ^= k
            h = rotl32(h, 13)
            h = (h * np.uint32(5) + np.uint32(0xE6546B64)).astype(np.uint32)
        # finalization, length = 8 bytes
        h ^= np.uint32(8)
        h ^= h >> np.uint32(16)
        h = (h * np.uint32(0x85EBCA6B)).astype(np.uint32)
        h ^= h >> np.uint32(13)
        h = (h * np.uint32(0xC2B2AE35)).astype(np.uint32)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


def _murmur3_32_bytes(data: bytes) -> int:
    """Scalar murmur3_x86_32 (seed 0) over arbitrary bytes (strings)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    mask = 0xFFFFFFFF
    h = 0
    n = len(data)
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & mask
        k = ((k << 15) | (k >> 17)) & mask
        k = (k * c2) & mask
        h ^= k
        h = ((h << 13) | (h >> 19)) & mask
        h = (h * 5 + 0xE6546B64) & mask
    if rounded < n:
        k = int.from_bytes(data[rounded:], "little")
        k = (k * c1) & mask
        k = ((k << 15) | (k >> 17)) & mask
        k = (k * c2) & mask
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & mask
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & mask
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def bucket_long(col: Column, n: int) -> Column:
    """Iceberg bucket[n] for int/long columns."""

    @F.pandas_udf("int")
    def _bucket(s: pd.Series) -> pd.Series:
        hashes = _murmur3_32_8bytes_le(s.to_numpy(dtype=np.int64))
        return pd.Series((hashes & 0x7FFFFFFF) % n, dtype="int32")

    return _bucket(col)


def _murmur3_32_bytes_vec(lens: np.ndarray, flat: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32 (seed 0) over a batch of byte strings.

    `flat` is every string's bytes concatenated; `lens` the per-string
    byte lengths. The sequential mixing loop runs over *block columns*
    (max_len/4 numpy passes over the whole batch) instead of per row —
    same results as `_murmur3_32_bytes`, batch-speed.
    """
    mask = np.uint32(0xFFFFFFFF)  # implicit via uint32 dtype
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
    rows = len(lens)
    if rows == 0:
        return np.empty(0, dtype=np.int32)
    width = ((int(lens.max()) + 3) // 4) * 4 if lens.max() else 4
    offs = np.zeros(rows, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    # gather into a zero-padded (rows, width) matrix: index clamp + mask
    idx = offs[:, None] + np.arange(width, dtype=np.int64)[None, :]
    valid = np.arange(width, dtype=np.int64)[None, :] < lens[:, None]
    M = np.where(valid, flat[np.minimum(idx, len(flat) - 1)], 0).astype(np.uint8)
    K = M.view("<u4").astype(np.uint32)  # (rows, width//4) little-endian blocks
    nblocks = lens // 4  # full blocks per row
    rem = lens % 4

    def rotl(x: np.ndarray, r: int) -> np.ndarray:
        return (x << np.uint32(r)) | (x >> np.uint32(32 - r))

    h = np.zeros(rows, dtype=np.uint32)
    old = np.errstate(over="ignore")
    with old:
        for j in range(K.shape[1]):
            full = j < nblocks  # rows for which block j is a full block
            k = np.where(full, K[:, j], 0).astype(np.uint32)
            k = rotl(k * c1, 15) * c2
            h2 = (rotl(h ^ k, 13) * np.uint32(5)) + np.uint32(0xE6546B64)
            h = np.where(full, h2, h)
        # tail: the final 1-3 bytes (block index nblocks), zero-padded by
        # construction so the gathered uint32 already equals the
        # little-endian tail value
        has_tail = rem > 0
        if has_tail.any():
            tk = np.where(has_tail, K[np.arange(rows), np.minimum(nblocks, K.shape[1] - 1)], 0).astype(np.uint32)
            tk = rotl(tk * c1, 15) * c2
            h = np.where(has_tail, h ^ tk, h)
        h ^= lens.astype(np.uint32)
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


def bucket_string(col: Column, n: int) -> Column:
    """Iceberg bucket[n] for string columns (UTF-8 bytes)."""

    @F.pandas_udf("int")
    def _bucket(s: pd.Series) -> pd.Series:
        enc = s.fillna("").str.encode("utf-8")
        lens = enc.str.len().to_numpy(np.int64)
        flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
        hashes = _murmur3_32_bytes_vec(lens, flat)
        return pd.Series((hashes.astype(np.int64) & 0x7FFFFFFF) % n, dtype="int32")

    return _bucket(col)


def truncate_long(col: Column, width: int) -> Column:
    """Iceberg truncate[W] for integers: v - (v mod W), floor semantics."""
    return (col - F.pmod(col, F.lit(width))).cast("long")


def truncate_string(col: Column, width: int) -> Column:
    return F.substring(col, 1, width)


def years(ts: Column) -> Column:
    """Years from 1970 (Iceberg `year` transform)."""
    return (F.year(ts) - F.lit(1970)).cast("int")


def months(ts: Column) -> Column:
    """Months from 1970-01 (Iceberg `month` transform)."""
    return ((F.year(ts) - 1970) * 12 + F.month(ts) - 1).cast("int")


def days(ts: Column) -> Column:
    """Days from epoch (Iceberg `day` transform)."""
    return F.datediff(ts.cast("date"), F.lit("1970-01-01").cast("date"))


def hours(ts: Column) -> Column:
    """Hours from epoch (Iceberg `hour` transform)."""
    return F.floor(F.unix_timestamp(ts) / 3600).cast("int")
