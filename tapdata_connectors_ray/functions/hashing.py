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


# -- generic (TableSpec-driven) key hashing ---------------------------------

# nulls hash to a fixed sentinel so null == null (the reference's null-safe
# key matching: ``NormalWriteRecorder.java:365-376``)
_NULL_HASH = np.uint64(0x9AE16A3B2F90404F)
_COMBINE = np.uint64(0x100000001B3)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic avalanche for integer keys (uint64 in/out)."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def hash_column(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """uint64 content hash of one Arrow column, vectorized, null-safe.
    Strings use the polynomial hash above; integer-like types go through
    splitmix64 on their int64 representation; anything else falls back to a
    string cast (deterministic, not hot-path)."""
    import pyarrow.compute as pc

    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(col, "").to_numpy(zero_copy_only=False)
        h = stable_hash_strings(vals)
        h[null_mask] = _NULL_HASH
        return h
    if (
        pa.types.is_integer(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date(t)
        or pa.types.is_boolean(t)
    ):
        as_int = col.cast(pa.int64())
        null_mask = pc.is_null(as_int).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(as_int, 0).to_numpy(zero_copy_only=False)
        h = _splitmix64(np.asarray(vals, dtype=np.int64).view(np.uint64))
        h[null_mask] = _NULL_HASH
        return h
    # fallback: canonical string form
    as_str = col.cast(pa.string())
    null_mask = pc.is_null(as_str).to_numpy(zero_copy_only=False)
    vals = pc.fill_null(as_str, "").to_numpy(zero_copy_only=False)
    h = stable_hash_strings(vals)
    h[null_mask] = _NULL_HASH
    return h


def key_hash_columns(batch: pa.Table, columns: list[str]) -> np.ndarray:
    """uint64 composite hash of the given key columns (order-sensitive)."""
    h = np.full(len(batch), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in columns:
            h = (h * _COMBINE) ^ hash_column(batch[c])
        h = _splitmix64(h)
    return h


def partition_ids_for(batch: pa.Table, columns: list[str], num_partitions: int) -> np.ndarray:
    """Generic shuffle key: [0, num_partitions) from arbitrary key columns.
    A single string column reduces to the same hash as :func:`partition_ids`
    did NOT use the final splitmix — partition assignments are therefore
    spec-versioned; lakes record their spec in the manifest and never mix
    hash functions across restarts."""
    if len(columns) == 1:
        col = batch[columns[0]]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            import pyarrow.compute as pc

            if pc.count(col, mode="only_null").as_py() == 0:
                # fast path == legacy transcripts partitioning (conv_id)
                return (
                    stable_hash_strings(col.to_numpy(zero_copy_only=False))
                    % np.uint64(num_partitions)
                ).astype(np.int32)
    return (key_hash_columns(batch, columns) % np.uint64(num_partitions)).astype(np.int32)


def md5_number_lower(values: list[str]) -> np.ndarray:
    """Per-row uint64 matching DuckDB's ``md5_number_lower(s)``: the low 8
    digest bytes, little-endian.  md5 has no vectorized kernel; this is a
    checksum utility (consistency verification), not a hot-path transform."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little") for s in values),
        dtype=np.uint64, count=len(values),
    )
