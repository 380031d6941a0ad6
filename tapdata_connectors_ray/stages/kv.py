"""Key-value sink projection — the KV-store target family (redis /
hazelcast / tablestore) re-expressed as a vectorized stage.

The reference's KV writers (``redis-connector/.../writer/
AbstractRedisRecordWriter.java:94-116``, ``StringRedisRecordWriter.java``)
build one string key per row — ``keyExpression`` ``${field}`` template, or
``keyPrefix + join(primary keys, keyJoin) + keySuffix`` with nulls rendered
as ``"null"`` — and one value (JSON document or joined text), applying
inserts/updates as SET and deletes as DEL; a key-changing update DELs the
before-image key first.  In this engine those replay semantics already live
in the LWW merge (key-move expansion emits the tombstone at the old key),
so the KV view is a pure projection of the merged final state: one (key,
value) row per live record, built with Arrow kernels, no per-row Python in
text mode.

``value_mode="json"`` builds a JSON document per row (field order = column
order, like the reference's fieldList by position); that path is per-row by
nature of JSON assembly and is meant for sink formatting, not hot-path
analytics.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def _string_col(batch: pa.Table, name: str) -> pa.Array:
    return pc.fill_null(pc.cast(batch[name], pa.string()), "null")


def make_kv_projection(
    key_columns: list[str],
    value_columns: list[str],
    key_prefix: str = "",
    key_join: str = ":",
    key_suffix: str = "",
    value_mode: str = "text",
    value_join: str = "|",
):
    """map_batches stage: rows -> ``(kv_key, kv_value)``.

    Key = prefix + key columns joined by ``key_join`` + suffix (nulls ->
    "null", RedisConfig key build).  Value = ``text`` (value columns joined
    by ``value_join``) or ``json`` (document of value columns)."""
    if value_mode not in ("text", "json"):
        raise ValueError(f"value_mode must be 'text' or 'json', got {value_mode!r}")

    def project(batch: pa.Table) -> pa.Table:
        keys = [_string_col(batch, c) for c in key_columns]
        key = pc.binary_join_element_wise(*keys, key_join)
        if key_prefix or key_suffix:
            key = pc.binary_join_element_wise(
                pa.scalar(key_prefix), key, pa.scalar(key_suffix), ""
            )
        if value_mode == "text":
            vals = [_string_col(batch, c) for c in value_columns]
            value = pc.binary_join_element_wise(*vals, value_join)
        else:
            docs = batch.select(value_columns).to_pylist()
            value = pa.array(
                [json.dumps(d, default=str, separators=(",", ":")) for d in docs],
                pa.string(),
            )
        return pa.table({"kv_key": key, "kv_value": value})

    return project
