"""Hand-crafted semantics cases for the single-process oracle reducer
(upsert policies, dup-LSN idempotency, delete/re-insert, schema evolution) —
modeled on the reference TDD write tests (``tests/v2/WriteRecordTest.java``)."""

import json

import pyarrow as pa

from tapdata_connectors_ray.oracle import OracleReducer
from tapdata_connectors_ray.schema import EVENT_LOG_SCHEMA, TRANSCRIPTS_SCHEMA


def ev(lsn, op, conv="c1", turn=0, text=None, ver=1, **kw):
    row = {
        "lsn": lsn, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": kw.get("role", "user"), "text": text,
        "tool": kw.get("tool"), "tool_name": kw.get("tool_name"),
        "tool_meta": kw.get("tool_meta"), "turn_score": kw.get("turn_score"),
        "ts": None, "schema_ver": ver, "ddl_payload": kw.get("ddl_payload"),
        "before_conv_id": kw.get("before_conv_id"),
        "before_turn_idx": kw.get("before_turn_idx"),
    }
    if op in ("D", "DDL"):
        row.update({"role": None, "text": None})
    if op == "DDL":
        row.update({"conv_id": None, "turn_idx": None})
    return row


def events_table(rows):
    return pa.Table.from_pylist(rows, schema=EVENT_LOG_SCHEMA)


def run(rows, base_rows=()):
    red = OracleReducer()
    if base_rows:
        red.apply_base(pa.Table.from_pylist(list(base_rows), schema=TRANSCRIPTS_SCHEMA))
    red.apply_events(events_table(rows))
    return red


def test_insert_update_delete_lifecycle():
    red = run([
        ev(1, "I", text="a"),
        ev(2, "U", text="b"),
        ev(3, "D"),
    ])
    assert red.state == {}
    assert red.counters.inserted == 1
    assert red.counters.modified == 1
    assert red.counters.removed == 1


def test_upsert_policies():
    # insert on existing key => update_on_exists; update on missing =>
    # insert_on_nonexists (survey §2.2 policy mapping)
    red = run([
        ev(1, "I", text="a"),
        ev(2, "I", text="b"),   # upsert
        ev(3, "U", conv="c2", text="x"),  # insert-on-nonexists
    ])
    assert red.state[("c1", 0)]["text"] == "b"
    assert red.state[("c2", 0)]["text"] == "x"
    assert red.counters.inserted == 2
    assert red.counters.modified == 1


def test_delete_missing_is_noop_and_reinsert():
    red = run([
        ev(1, "D", conv="ghost"),
        ev(2, "I", text="a"),
        ev(3, "D"),
        ev(4, "U", text="born-again"),
    ])
    assert red.counters.removed == 1
    assert red.state[("c1", 0)]["text"] == "born-again"


def test_duplicate_lsn_idempotent():
    red = run([
        ev(1, "I", text="a"),
        ev(1, "I", text="a"),  # replayed verbatim
        ev(2, "U", text="b"),
        ev(2, "U", text="b"),
    ])
    assert red.counters.skipped_duplicates == 2
    assert red.counters.inserted == 1
    assert red.counters.modified == 1
    assert red.state[("c1", 0)]["text"] == "b"


def test_schema_evolution_mapping():
    red = run([
        ev(1, "I", text="a", tool="search", ver=1),
        ev(2, "DDL", ver=2, ddl_payload=json.dumps({"kind": "add_field", "name": "tool_meta", "type": "string"})),
        ev(3, "I", conv="c2", text="b", tool="python", tool_meta="m", ver=2),
        ev(4, "DDL", ver=3, ddl_payload=json.dumps({"kind": "rename_field", "from": "tool", "to": "tool_name"})),
        ev(5, "I", conv="c3", text="c", tool_name="browser", ver=3),
    ])
    assert red.state[("c1", 0)]["tool_name"] == "search"   # carried across rename
    assert red.state[("c3", 0)]["tool_name"] == "browser"
    # tool_meta is added at v2 and dropped again at v5 in the fixture
    # schedule, so the reducer's latest-state rows never carry it
    assert "tool_meta" not in red.state[("c2", 0)]
    assert red.counters.ddl_applied == 2


def test_base_snapshot_then_events():
    base = [{
        "conv_id": "c1", "turn_idx": 0, "role": "user", "text": "orig",
        "tool": "search", "turn_score": 5, "ts": None,
    }]
    red = run([ev(1, "U", text="patched", ver=1)], base_rows=base)
    assert red.state[("c1", 0)]["text"] == "patched"
    assert red.counters.inserted == 1  # the base row
    assert red.counters.modified == 1


def test_final_table_sorted_latest_schema():
    red = run([ev(2, "I", conv="z", text="zz"), ev(1, "I", conv="a", text="aa")])
    t = red.final_table()
    assert t.column_names == [
        "conv_id", "turn_idx", "role", "text", "tool_name", "turn_score", "ts",
    ]
    assert t["conv_id"].to_pylist() == ["a", "z"]


def test_schema_registry_actor_drift(ray_session):
    """Live-tail drift detection: stages poll version(); DDL rows bump it and
    the refetched plan folds them idempotently (duplicate-LSN DDL is a no-op)."""
    import json as _json

    import ray

    from tapdata_connectors_ray.state.registry import SchemaRegistryActor

    reg = SchemaRegistryActor.remote()
    assert ray.get(reg.version.remote()) == 1
    rows = [
        {"lsn": 10, "schema_ver": 2,
         "ddl_payload": _json.dumps({"kind": "add_field", "name": "x", "type": "string"})},
        {"lsn": 20, "schema_ver": 3,
         "ddl_payload": _json.dumps({"kind": "drop_field", "name": "x"})},
    ]
    assert ray.get(reg.apply_ddl_rows.remote(rows)) == 3
    assert ray.get(reg.apply_ddl_rows.remote(rows)) == 3  # replay no-op
    plan = ray.get(reg.get_plan.remote())
    assert [c.kind for c in plan.changes] == ["add_field", "drop_field"]
    assert "x" not in plan.schema_at().names
