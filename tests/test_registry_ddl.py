"""Unknown/malformed DDL degradation (reference: TapDDLUnknownEvent fallback,
DDLFactory.java:63-88 / MysqlReader.java:722-731): a DDL log row that cannot
be parsed into a typed change must NOT kill the replay — it degrades to a
``kind="unknown"`` schema no-op that is preserved in the history (and so
surfaced by the schema-history query)."""

import json

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tapdata_connectors_ray.state.registry import DDLChange, EvolutionPlan


def _unknown(change: DDLChange) -> bool:
    return change.kind == "unknown" and "reason" in change.payload


def test_unparseable_json_degrades_to_unknown():
    ch = DDLChange.from_row(lsn=7, version=2, ddl_payload="ALTER TABLE ???")
    assert _unknown(ch)
    assert ch.payload["raw"] == "ALTER TABLE ???"


def test_unrecognized_kind_degrades_to_unknown():
    payload = json.dumps({"kind": "exotic_partition_op", "name": "x"})
    ch = DDLChange.from_row(lsn=8, version=2, ddl_payload=payload)
    assert _unknown(ch)
    assert "exotic_partition_op" in ch.payload["reason"]


def test_missing_kind_degrades_to_unknown():
    ch = DDLChange.from_row(lsn=9, version=2, ddl_payload=json.dumps({"name": "x"}))
    assert _unknown(ch)


def test_unsafe_widen_degrades_to_unknown():
    payload = json.dumps(
        {"kind": "widen_field", "name": "n", "from_type": "int64", "to_type": "int32"}
    )
    ch = DDLChange.from_row(lsn=10, version=2, ddl_payload=payload)
    assert _unknown(ch)
    assert "unsafe" in ch.payload["reason"]


def test_unknown_change_is_schema_noop():
    good = DDLChange.from_row(
        lsn=1, version=2, ddl_payload=json.dumps({"kind": "add_field", "name": "extra", "type": "int64"})
    )
    bad = DDLChange.from_row(lsn=2, version=3, ddl_payload="garbage{")
    plan = EvolutionPlan(changes=[good, bad])
    ref = EvolutionPlan(changes=[good])
    assert plan.schema_at() == ref.schema_at()
    assert plan.latest_version == 3  # version advances; schema does not

    t = pa.table(
        {
            "conv_id": ["c1"], "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"], "text": ["hi"], "ts": pa.array([0], pa.int64()),
        }
    )
    migrated = plan.migrate_table(t, from_version=2)
    assert migrated.column_names == t.column_names

    batch = t.append_column("schema_ver", pa.array([3], pa.int64())).append_column(
        "extra", pa.array([5], pa.int64())
    )
    out = plan.rewrite_to_latest(batch)
    assert out["extra"].to_pylist() == [5]


def test_replay_survives_malformed_ddl_row(smoke_fixture_dir, tmp_path):
    """End-to-end: inject one garbage DDL row into the log; the replayed final
    state is unchanged and the history surfaces the unknown event."""
    from tapdata_connectors_ray.pipelines.replay import (
        replay_final_state,
        scan_evolution_plan_distributed,
    )

    ev_path = smoke_fixture_dir + "/events.parquet"
    base_path = smoke_fixture_dir + "/transcripts.parquet"
    events = pq.read_table(ev_path)

    bad_lsn = pa.compute.max(events["lsn"]).as_py() + 1
    max_ver = pa.compute.max(events["schema_ver"]).as_py()
    ddl_rows = events.filter(pa.compute.equal(events["op"], "DDL"))
    assert len(ddl_rows) > 0, "smoke fixture must carry DDL events"
    row = ddl_rows.slice(0, 1).to_pylist()[0]
    row.update(lsn=bad_lsn, schema_ver=max_ver, ddl_payload="NOT-JSON ALTER ???")
    mod = pa.concat_tables(
        [events, pa.Table.from_pylist([row], schema=events.schema)]
    )
    mod_path = str(tmp_path / "events_mod.parquet")
    pq.write_table(mod, mod_path)

    plan = scan_evolution_plan_distributed(mod_path)
    unknown = [c for c in plan.changes if c.kind == "unknown"]
    assert [c.lsn for c in unknown] == [bad_lsn]

    def final_df(path):
        df = replay_final_state(path, base_path, num_partitions=8).to_pandas()
        return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(final_df(mod_path), final_df(ev_path))


def test_index_ddl_typed_noop():
    """create/drop-index DDL parses to the typed kind='index' history row
    (CommonDbConnector.java:400-443 surface) — a schema no-op that stays
    distinguishable from degraded-unknown DDL."""
    import json

    from tapdata_connectors_ray.state.registry import DDLChange, EvolutionPlan

    c = DDLChange.from_row(
        7, 2, json.dumps({"kind": "create_index", "name": "ix", "columns": ["a"]})
    )
    assert c.kind == "index" and c.payload["action"] == "create_index"
    d = DDLChange.from_row(9, 2, json.dumps({"kind": "drop_index", "name": "ix"}))
    assert d.kind == "index" and d.payload["action"] == "drop_index"
    bogus = DDLChange.from_row(11, 2, json.dumps({"kind": "exotic"}))
    assert bogus.kind == "unknown"
    # schema unchanged by index events
    plan = EvolutionPlan(changes=[c, d])
    assert plan.schema_at().names == plan.spec.base_schema.names
