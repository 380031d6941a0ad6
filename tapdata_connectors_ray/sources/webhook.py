"""HTTP-receiver (webhook) push source: raw JSON callback envelopes ->
normalized change-event batches.

The reference's webhook connector receives raw JSON callback envelopes on
the *server's* thread — there is no poll loop, and batchRead is explicitly
unsupported (``connectors/http-receiver-connector/.../HttpReceiverConnector.
java:75`` registers ``supportRawDataCallbackFilterFunctionV2``; ``:106-108``
logs that batch read is not supported).  Envelope handling
(``util/Tags.java:56-71`` ``filterCallbackEvent``):

* an envelope without ``proxy_callback_supplier_id`` is a system error and
  is dropped;
* the payload rides under ``"array"`` (a list of records) when
  ``proxy_callback_array_content`` is true, else under ``"map"`` (one
  record); a missing body drops the envelope.

Record decode (``receiver/EventHandle.java:22-52``):

* ``opType`` ``i``/``u``/``d`` selects insert/update/delete; ANY other (or
  missing) value defaults to INSERT (``Tags.getOp:44-54``);
* ``time`` is the reference timestamp, falling back to receipt time;
* event data comes from ``"after"``; ``"before"`` carries the prior image —
  a DELETE's row image IS its before (``EventHandle.java:40-42``), an
  UPDATE's before marks a key move.

An optional user hook may rewrite each payload first (the JS
``handleEvent(eventData, supplierId)`` seam, ``HttpReceiverConnector.
java:128-143``); our analogue is a plain Python callable applied by the
sender adapter before encoding, per the extension surface (§2.11) — the
DECODER below consumes the canonical after/before shape.

In-sandbox analogue: no HTTP listener exists (no network), so the receive
path is the ``PushReceiver`` actor queue (``pipelines/livetail.py``) — the
listen-socket analogue — and this module is the payload DECODE at the
receiver's edge: NDJSON envelope text -> the engine's physical change-event
Arrow schema, with receipt LSNs assigned monotonically in arrival order
(the connector's stream offset is receipt time,
``HttpReceiverConnector.java:99-104``; ``time`` here is epoch MICROseconds
so timestamps round-trip the lake's us resolution losslessly — the
reference's Long is epoch millis).

The decode is Arrow-vectorized end-to-end: ``pyarrow.json.read_json`` with
an explicit envelope schema parses the whole wave in C++, list-flatten /
struct-field kernels explode and project the records, and one
``lexsort``-take restores global arrival order — no per-record Python.  A
webhook source carries no DDL (the upstream pushes rows in its CURRENT
schema), so decoded rows are stamped with the task's declared schema
version and the ingest runs under the task-config evolution plan rather
than a log-scanned one.
"""

from __future__ import annotations

import datetime
import io
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import json as pa_json

from tapdata_connectors_ray.schema import EVENT_LOG_SCHEMA
from tapdata_connectors_ray.state.registry import EvolutionPlan

#: wire op codes (Tags.java:20-22) -> engine op codes
_WIRE_OPS = ("i", "u", "d")

_EPOCH = datetime.datetime(1970, 1, 1)
_US = datetime.timedelta(microseconds=1)


def _wire_type(t: pa.DataType) -> pa.DataType:
    """JSON wire type for a payload field: the JSON parser reads integers as
    int64 and floats as float64; narrower targets are cast at assembly."""
    if pa.types.is_integer(t):
        return pa.int64()
    if pa.types.is_floating(t):
        return pa.float64()
    return t


def record_struct(plan: EvolutionPlan) -> pa.StructType:
    """The canonical webhook record shape for ``plan``'s table: after/before
    carry the LATEST payload schema (minus ``ts``, which rides top-level as
    ``time`` — EventHandle.java:31)."""
    payload = plan.schema_at()
    after = [
        pa.field(f.name, _wire_type(f.type))
        for f in payload
        if f.name != "ts"
    ]
    before = [
        pa.field(k, _wire_type(payload.field(k).type)) for k in plan.keys()
    ]
    return pa.struct(
        [
            pa.field("opType", pa.string()),
            pa.field("time", pa.int64()),
            pa.field("after", pa.struct(after)),
            pa.field("before", pa.struct(before)),
        ]
    )


def envelope_schema(plan: EvolutionPlan) -> pa.Schema:
    rec = record_struct(plan)
    return pa.schema(
        [
            pa.field("proxy_callback_supplier_id", pa.string()),
            pa.field("proxy_callback_array_content", pa.bool_()),
            pa.field("map", rec),
            pa.field("array", pa.list_(rec)),
        ]
    )


def _as_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)
        if col.num_chunks == 0:
            return pa.array([], type=col.type)
        return pa.concat_arrays(col.chunks)
    return col


def _records_in_arrival_order(env: pa.Table, rec_type: pa.StructType) -> pa.Array:
    """Explode map/array envelopes into ONE record StructArray in global
    arrival order (envelope order, then position within an array body)."""
    n_env = len(env)
    env_idx = np.arange(n_env, dtype=np.int64)
    is_array = pc.fill_null(env["proxy_callback_array_content"], False)

    # single-record envelopes ("map" body)
    map_mask = pc.and_(pc.invert(is_array), pc.is_valid(env["map"]))
    map_recs = _as_array(env["map"].filter(map_mask))
    map_env = env_idx[map_mask.to_numpy(zero_copy_only=False)]
    map_within = np.zeros(len(map_recs), dtype=np.int64)

    # list envelopes ("array" body) — flatten keeps within-list order
    arr_mask = pc.and_(is_array, pc.is_valid(env["array"]))
    arr_col = _as_array(env["array"].filter(arr_mask))
    arr_recs = _as_array(pc.list_flatten(arr_col))
    parents = pc.list_parent_indices(arr_col).to_numpy(zero_copy_only=False)
    # a null element INSIDE an array body (partial serialization, trailing
    # comma artifacts) is not a record — EventHandle has no null-record
    # path; without this it would decode to a phantom all-null-key INSERT
    rec_valid = pc.is_valid(arr_recs)
    if not pc.all(rec_valid).as_py():
        parents = parents[rec_valid.to_numpy(zero_copy_only=False)]
        arr_recs = arr_recs.filter(rec_valid)
    arr_env_idx = env_idx[arr_mask.to_numpy(zero_copy_only=False)]
    if len(parents):
        # position within each list: arange minus each run's start offset
        _, starts, counts = np.unique(parents, return_index=True, return_counts=True)
        arr_within = np.arange(len(parents), dtype=np.int64) - np.repeat(starts, counts)
        arr_env = arr_env_idx[parents]
    else:
        arr_within = np.zeros(0, dtype=np.int64)
        arr_env = np.zeros(0, dtype=np.int64)

    recs = pa.concat_arrays([map_recs.cast(rec_type), arr_recs.cast(rec_type)])
    order = np.lexsort((np.concatenate([map_within, arr_within]),
                        np.concatenate([map_env, arr_env])))
    return recs.take(pa.array(order, pa.int64()))


def decode_webhook_payload(
    ndjson: str | bytes,
    plan: EvolutionPlan,
    *,
    base_lsn: int,
    receipt_time_us: int,
    wire_schema: pa.Schema = EVENT_LOG_SCHEMA,
) -> tuple[pa.Table, dict]:
    """One received wave of NDJSON envelopes -> an event batch in the
    physical ``wire_schema`` (columns the decoder does not produce — old
    version names, ``ddl_payload`` — are null; ``schema_ver`` is the
    declared plan's latest).  Receipt LSNs are ``base_lsn + arrival index``.

    Returns ``(events, stats)`` where stats counts received / dropped
    envelopes and decoded records (the WriteListResult-style accounting)."""
    if isinstance(ndjson, str):
        ndjson = ndjson.encode()
    if not ndjson.strip():
        # an empty push wave (heartbeat) decodes to zero events, not an error
        empty = wire_schema.empty_table()
        return empty, {"received_envelopes": 0, "dropped_no_supplier": 0,
                       "records": 0}
    env = pa_json.read_json(
        io.BytesIO(ndjson),
        parse_options=pa_json.ParseOptions(
            explicit_schema=envelope_schema(plan),
            unexpected_field_behavior="ignore",
        ),
    )
    n_received = len(env)
    # Tags.filterCallbackEvent: no supplier id -> system error, drop
    env = env.filter(pc.is_valid(env["proxy_callback_supplier_id"]))
    n_dropped = n_received - len(env)

    recs = _records_in_arrival_order(env, record_struct(plan))
    n = len(recs)

    # opType i/u/d, ANYTHING else (or null) -> insert (Tags.getOp)
    op_raw = pc.struct_field(recs, "opType")
    known = pc.fill_null(pc.is_in(op_raw, value_set=pa.array(_WIRE_OPS)), False)
    op = pc.if_else(known, pc.utf8_upper(op_raw), pa.scalar("I"))

    # reference time falls back to receipt time (EventHandle.java:31)
    t = pc.struct_field(recs, "time")
    ts = pc.if_else(pc.is_valid(t), t, pa.scalar(receipt_time_us, pa.int64())).cast(
        pa.timestamp("us")
    )

    after = pc.struct_field(recs, "after")
    before = pc.struct_field(recs, "before")
    keys = plan.keys()
    payload = plan.schema_at()
    is_delete = pc.equal(op, "D")
    is_update = pc.equal(op, "U")

    cols: dict[str, pa.Array] = {
        "lsn": pa.array(base_lsn + np.arange(n, dtype=np.int64), pa.int64()),
        "op": op,
        "ts": ts,
        "schema_ver": pa.array(
            np.full(n, plan.latest_version, np.int64), pa.int32()
        ),
    }
    for f in payload:
        if f.name == "ts":
            continue
        col = pc.struct_field(after, f.name)
        if f.name in keys:
            # a DELETE's row image is its before (EventHandle.java:40-42);
            # fall back to after for lenient senders that mirror the key
            bk = pc.struct_field(before, f.name)
            col = pc.if_else(pc.and_(is_delete, pc.is_valid(bk)), bk, col)
        cols[f.name] = col.cast(f.type, safe=True)
    for k in keys:
        # an UPDATE's before image marks a key-changing update; normalize
        # expands it into tombstone@old + upsert@new (stages/normalize.py)
        bk = pc.struct_field(before, k)
        cols[f"before_{k}"] = pc.if_else(
            is_update, bk, pa.nulls(n, bk.type)
        ).cast(payload.field(k).type, safe=True)

    arrays = []
    for f in wire_schema:
        if f.name in cols:
            arrays.append(cols[f.name].cast(f.type, safe=True))
        else:
            arrays.append(pa.nulls(n, f.type))
    out = pa.Table.from_arrays(arrays, schema=wire_schema)
    return out, {
        "received_envelopes": n_received,
        "dropped_no_supplier": n_dropped,
        "records": n,
    }


# ---------------------------------------------------------------------------
# Sender simulator (test harness, NOT engine code): serializes fixture event
# rows into the canonical envelope NDJSON the upstream supplier would POST.
# The real sender is an external system; this stands in for it in queries,
# soak tests and the driver gate, exercising every decode branch above.
# ---------------------------------------------------------------------------


def render_webhook_envelopes(
    events: pa.Table,
    plan: EvolutionPlan,
    *,
    supplier_id: str = "sup-001",
    drop_mod: int = 101,
    unknown_op_mod: int = 53,
    group: int = 4,
) -> str:
    """Fixture events -> NDJSON envelopes, in LSN order (arrival order ==
    log order, so receipt LSNs preserve the original LWW winners).

    Deterministic branch coverage baked in:

    * rows with ``lsn % drop_mod == 0`` are sent in a supplier-LESS
      singleton envelope -> the decoder MUST drop them (the SQL oracle
      mirrors this as ``lsn % drop_mod <> 0``);
    * INSERT rows with ``lsn % unknown_op_mod == 0`` are sent with an
      unrecognized ``opType`` -> default-insert branch;
    * kept rows alternate between one ``array`` envelope per ``group``
      records and ``group`` single-record ``map`` envelopes;
    * DDL rows are skipped — a webhook pushes DML in the upstream's CURRENT
      schema, so payloads are rendered post-migration (``tool_name``
      unified per the fixture's v3 rename).
    """
    payload = plan.schema_at()
    keys = plan.keys()
    order = pc.sort_indices(events, sort_keys=[("lsn", "ascending")])
    rows = events.take(order).to_pylist()

    def record(r: dict) -> dict:
        op = r["op"]
        rec: dict = {"opType": op.lower()}
        if op == "I" and r["lsn"] % unknown_op_mod == 0:
            rec["opType"] = "create"  # unrecognized -> insert default
        if r["ts"] is not None:
            # exact integer microseconds (naive datetimes are UTC here;
            # float .timestamp() would both assume local time and round)
            rec["time"] = (r["ts"] - _EPOCH) // _US
        if op == "D":
            rec["before"] = {k: r[k] for k in keys}
            return rec
        after = {}
        for f in payload:
            if f.name == "ts":
                continue
            # post-migration rendering: the upstream's current schema
            if f.name == "tool_name":
                v = r["tool_name"] if (r.get("schema_ver") or 1) >= 3 else r["tool"]
            else:
                v = r.get(f.name)
            if v is not None:
                after[f.name] = v
        rec["after"] = after
        if op == "U" and r.get(f"before_{keys[0]}") is not None:
            rec["before"] = {k: r[f"before_{k}"] for k in keys}
        return rec

    lines: list[str] = []
    chunk: list[dict] = []
    chunk_idx = 0

    def flush() -> None:
        nonlocal chunk, chunk_idx
        if not chunk:
            return
        if chunk_idx % 2 == 0:
            lines.append(json.dumps({
                "proxy_callback_supplier_id": supplier_id,
                "proxy_callback_array_content": True,
                "array": chunk,
            }))
        else:
            for rec in chunk:
                lines.append(json.dumps({
                    "proxy_callback_supplier_id": supplier_id,
                    "proxy_callback_array_content": False,
                    "map": rec,
                }))
        chunk = []
        chunk_idx += 1

    for r in rows:
        if r["op"] == "DDL":
            continue
        if r["lsn"] % drop_mod == 0:
            flush()
            lines.append(json.dumps({
                "proxy_callback_array_content": False,
                "map": record(r),
            }))
            continue
        chunk.append(record(r))
        if len(chunk) >= group:
            flush()
    flush()
    return "\n".join(lines) + "\n"
