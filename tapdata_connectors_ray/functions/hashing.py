"""Stable, vectorized hashing.

Two distinct needs, mirroring two reference mechanisms:

1. **Partitioning hash** — the analogue of the reference's hash-split shard
   predicate ``mod(CRC32(pk), maxSplit)`` (reference:
   ``connectors/mysql-connector/.../MysqlConnector.java:600-609``).  Must be
   *replay-stable across processes and library versions* because checkpoint
   manifests record per-partition watermarks keyed by partition id.  We use a
   fixed-base polynomial hash over the raw bytes, computed as a single
   uint64 matrix product (wraparound arithmetic) — no per-row Python.

2. **Row-content hash** — the whole-table consistency checksum (reference:
   ``MysqlConnector.java:782-827`` ``buildHashSql``: sum of per-row
   md5-derived integers).  We match DuckDB's ``md5_number_lower`` (little-
   endian low 8 bytes of the md5 digest) so the oracle SQL can reproduce it
   exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_FNV_PRIME = np.uint64(1099511628211)
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def stable_hash_strings(values: np.ndarray | list[str]) -> np.ndarray:
    """Deterministic uint64 hash of an array of (ascii) strings, vectorized.

    Polynomial hash sum(byte[i] * B^i) mod 2^64 followed by a murmur-style
    avalanche.  Zero bytes (padding) contribute nothing; real keys never
    contain NUL so padding is collision-safe.
    """
    arr = np.asarray(values)
    with np.errstate(over="ignore"):
        try:
            fixed = arr.astype("S")  # fixed-width bytes; raises on non-ascii
        except UnicodeEncodeError:
            out = np.fromiter(
                (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
                 for s in arr),
                dtype=np.uint64, count=len(arr),
            )
            return out
        width = fixed.dtype.itemsize
        mat = np.frombuffer(fixed.tobytes(), dtype=np.uint8).reshape(len(fixed), width)
        powers = np.empty(width, dtype=np.uint64)
        acc = np.uint64(1)
        for i in range(width):
            powers[i] = acc
            acc = acc * _FNV_PRIME
        h = (mat.astype(np.uint64) * powers[None, :]).sum(axis=1, dtype=np.uint64)
        h ^= h >> np.uint64(33)
        h *= _MIX1
        h ^= h >> np.uint64(33)
        h *= _MIX2
        h ^= h >> np.uint64(33)
    return h


def partition_ids(conv_id: pa.ChunkedArray | pa.Array | np.ndarray, num_partitions: int) -> np.ndarray:
    """Map key strings to [0, num_partitions) — the shuffle key."""
    if isinstance(conv_id, (pa.ChunkedArray, pa.Array)):
        conv_id = conv_id.to_numpy(zero_copy_only=False)
    return (stable_hash_strings(conv_id) % np.uint64(num_partitions)).astype(np.int32)


def md5_number_lower(values: list[str]) -> np.ndarray:
    """Per-row uint64 matching DuckDB's ``md5_number_lower(s)``: the low 8
    digest bytes, little-endian.  md5 has no vectorized kernel; this is a
    checksum utility (consistency verification), not a hot-path transform."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little") for s in values),
        dtype=np.uint64, count=len(values),
    )
