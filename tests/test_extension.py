"""Extension surface + partitioned-log source + table lifecycle tests."""

import os

import pyarrow as pa
import pytest


def test_transform_registry_compose(ray_session):
    import ray.data

    from tapdata_connectors_ray.extension import (
        apply_transforms,
        register_transform,
        registered_transforms,
    )

    @register_transform("t-add-one")
    def add_one(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(0, "x", pc.add(batch["x"], 1))

    @register_transform("t-double")
    def double(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(0, "x", pc.multiply(batch["x"], 2))

    assert {"t-add-one", "t-double"} <= set(registered_transforms())
    ds = ray.data.from_arrow(pa.table({"x": [1, 2, 3]}))
    out = apply_transforms(ds, ["t-add-one", "t-double"]).to_pandas()
    assert out["x"].tolist() == [4, 6, 8]

    with pytest.raises(ValueError):
        register_transform("t-double")(double)
    with pytest.raises(KeyError):
        apply_transforms(ds, ["nope"])


def test_partitioned_log_offsets(ray_session, tmp_path):
    from tapdata_connectors_ray.sources.partitioned_log import (
        PartitionedLogOffset,
        poll_topic,
        read_topic_segments,
        write_topic,
    )

    t = pa.table({"k": [f"k{i%7}" for i in range(100)], "v": list(range(100))})
    topic = str(tmp_path / "topic")
    write_topic(t, topic, "k", n_partitions=3, rows_per_segment=16)
    fresh, off = poll_topic(topic)
    assert len(fresh) >= 3
    assert read_topic_segments(fresh).count() == 100
    # offset JSON round-trip, idle poll
    off2 = PartitionedLogOffset.from_json(off.to_json())
    again, _ = poll_topic(topic, off2)
    assert again == []
    # producer appends -> only the delta surfaces
    write_topic(t.slice(0, 10), topic, "k", n_partitions=3)
    delta, _ = poll_topic(topic, off2)
    assert delta and read_topic_segments(delta).count() == 10


def test_clear_and_drop_table(ray_session, tmp_path):
    from tapdata_connectors_ray.fixtures import ensure_fixtures
    from tapdata_connectors_ray.pipelines.incremental import CheckpointedIngest

    d = ensure_fixtures("sf0.001")
    ev, base = d + "/events.parquet", d + "/transcripts.parquet"
    lake = str(tmp_path / "lake")
    ing = CheckpointedIngest(lake, num_partitions=8)
    ing.ingest(ev, base)
    assert ing.final_dataset().count() > 0

    ing.clear_table()
    assert ing.final_dataset().count() == 0
    assert ing.committed_plan().latest_version == 5  # schema history survives
    # reopen from disk: still empty, still the same schema
    ing2 = CheckpointedIngest(lake, num_partitions=8)
    assert ing2.final_dataset().count() == 0

    ing2.drop_table()
    assert not os.path.exists(lake)


def test_kv_projection_modes(ray_session):
    """KV sink projection (redis-family writers): key build with nulls ->
    'null', text and json value modes."""
    import pyarrow as pa

    from tapdata_connectors_ray.stages.kv import make_kv_projection

    batch = pa.table(
        {
            "a": pa.array([1, None], pa.int64()),
            "b": pa.array(["x", "y"], pa.string()),
            "v": pa.array([None, "q"], pa.string()),
        }
    )
    text = make_kv_projection(["a", "b"], ["v"], key_prefix="p:", key_join="-", key_suffix=":s")(batch)
    assert text["kv_key"].to_pylist() == ["p:1-x:s", "p:null-y:s"]
    assert text["kv_value"].to_pylist() == ["null", "q"]
    js = make_kv_projection(["b"], ["a", "v"], value_mode="json")(batch)
    assert js["kv_value"].to_pylist() == ['{"a":1,"v":null}', '{"a":null,"v":"q"}']
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_kv_projection(["a"], ["v"], value_mode="xml")
