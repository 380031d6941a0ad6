"""Property test: the distributed replay equals the sequential oracle
reducer on arbitrary little event logs (random ops, duplicate LSNs,
arbitrary file order) — the randomized counterpart of the fixed fixture.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tapdata_connectors_ray.oracle import expected_final_state
from tapdata_connectors_ray.schema import EVENT_LOG_SCHEMA

CONVS = ["conv-a", "conv-b", "conv-c"]


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for lsn in range(1, n + 1):
        conv = draw(st.sampled_from(CONVS))
        turn = draw(st.integers(min_value=0, max_value=3))
        op = draw(st.sampled_from(["I", "U", "D"]))
        # key-changing update: the before-image names a (possibly different)
        # key the update moves away from
        move = op == "U" and draw(st.booleans())
        before_conv = draw(st.sampled_from(CONVS)) if move else None
        before_turn = draw(st.integers(min_value=0, max_value=3)) if move else None
        rows.append(
            {
                "lsn": lsn,
                "op": op,
                "conv_id": conv,
                "turn_idx": turn,
                "role": None if op == "D" else "user",
                "text": None if op == "D" else f"t-{conv}-{turn}-{lsn}",
                "tool": None,
                "tool_name": None,
                "tool_meta": None,
                "turn_score": None if op == "D" else lsn,
                "ts": None,
                "schema_ver": 1,
                "ddl_payload": None,
                "before_conv_id": before_conv,
                "before_turn_idx": before_turn,
            }
        )
    # duplicate-LSN replays of a random sample
    dup_idx = draw(
        st.lists(st.integers(min_value=0, max_value=n - 1), max_size=5)
    )
    rows.extend(rows[i] for i in dup_idx)
    # arbitrary file order
    order = draw(st.permutations(range(len(rows))))
    rows = [rows[i] for i in order]
    # full DDL schedule after the DML (the reducer assumes the fixture's
    # complete evolution; a plan-less log would legitimately stay at v1)
    import json

    for off, (kind_payload, ver) in enumerate(
        [
            ({"kind": "add_field", "name": "tool_meta", "type": "string"}, 2),
            ({"kind": "rename_field", "from": "tool", "to": "tool_name"}, 3),
            ({"kind": "widen_field", "name": "turn_score",
              "from_type": "int32", "to_type": "int64"}, 4),
            ({"kind": "drop_field", "name": "tool_meta"}, 5),
        ]
    ):
        rows.append(
            {
                "lsn": n + 1 + off,
                "op": "DDL",
                "conv_id": None,
                "turn_idx": None,
                "role": None,
                "text": None,
                "tool": None,
                "tool_name": None,
                "tool_meta": None,
                "turn_score": None,
                "ts": None,
                "schema_ver": ver,
                "before_conv_id": None,
                "before_turn_idx": None,
                "ddl_payload": json.dumps(kind_payload, sort_keys=True),
            }
        )
    return rows


def _to_table(rows: list[dict]) -> pa.Table:
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("Int32")
    df["turn_score"] = df["turn_score"].astype("Int64")
    df["schema_ver"] = df["schema_ver"].astype("int32")
    df["ts"] = pd.Series([pd.NaT] * len(df), dtype="datetime64[us]")
    return pa.Table.from_pandas(df, schema=EVENT_LOG_SCHEMA, preserve_index=False)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(log=event_logs())
@pytest.mark.parametrize("strategy", ["shuffle", "semijoin"])
def test_replay_equals_reducer(ray_session, tmp_path_factory, strategy, log):
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.replay import replay_final_state

    d = tmp_path_factory.mktemp("prop")
    path = str(d / "events.parquet")
    table = _to_table(log)
    pq.write_table(table, path)

    exp = expected_final_state(
        EVENT_LOG_SCHEMA.empty_table().select(
            ["conv_id", "turn_idx", "role", "text", "tool", "turn_score", "ts"]
        ).cast(
            pa.schema(
                [
                    pa.field("conv_id", pa.string()),
                    pa.field("turn_idx", pa.int32()),
                    pa.field("role", pa.string()),
                    pa.field("text", pa.string()),
                    pa.field("tool", pa.string()),
                    pa.field("turn_score", pa.int32()),
                    pa.field("ts", pa.timestamp("us")),
                ]
            )
        ),
        table,
    ).to_pandas()

    got = replay_final_state(path, None, num_partitions=4, strategy=strategy).to_pandas()
    if got.empty and len(got.columns) == 0:
        # a fully-deleted table comes back as 0 blocks (Ray drops empty
        # blocks, losing the schema) — normalize for the frame compare
        got = pd.DataFrame(columns=exp.columns).astype(exp.dtypes.to_dict())
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got["turn_score"] = got["turn_score"].astype("Int64")
    got["turn_idx"] = got["turn_idx"].astype("Int32")
    exp["turn_idx"] = exp["turn_idx"].astype("Int32")
    exp["turn_score"] = exp["turn_score"].astype("Int64")
    pd.testing.assert_frame_equal(got[exp.columns], exp)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(log=event_logs(), data=st.data())
def test_checkpointed_epochs_equal_reducer(ray_session, tmp_path_factory, log, data):
    """Checkpointed ingest over ARBITRARY epoch boundaries (including empty
    epochs and a final partial boundary) converges to the sequential
    reducer's state — the randomized resume/exactly-once gate."""
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.incremental import CheckpointedIngest

    d = tmp_path_factory.mktemp("prop_epochs")
    path = str(d / "events.parquet")
    table = _to_table(log)
    pq.write_table(table, path)
    max_lsn = max(r["lsn"] for r in log)

    n_bounds = data.draw(st.integers(min_value=1, max_value=4))
    bounds = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=max_lsn + 2),
                min_size=n_bounds, max_size=n_bounds,
            )
        )
    ) + [max_lsn + 10]

    ing = CheckpointedIngest(str(d / "lake"), num_partitions=4)
    for b in bounds:
        ing.ingest(path, None, end_lsn=int(b))

    exp = expected_final_state(
        EVENT_LOG_SCHEMA.empty_table().select(
            ["conv_id", "turn_idx", "role", "text", "tool", "turn_score", "ts"]
        ).cast(
            pa.schema(
                [
                    pa.field("conv_id", pa.string()),
                    pa.field("turn_idx", pa.int32()),
                    pa.field("role", pa.string()),
                    pa.field("text", pa.string()),
                    pa.field("tool", pa.string()),
                    pa.field("turn_score", pa.int32()),
                    pa.field("ts", pa.timestamp("us")),
                ]
            )
        ),
        table,
    ).to_pandas()

    got = ing.final_dataset().to_pandas()
    if got.empty and len(got.columns) == 0:
        got = pd.DataFrame(columns=exp.columns).astype(exp.dtypes.to_dict())
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for df in (got, exp):
        df["turn_score"] = df["turn_score"].astype("Int64")
        df["turn_idx"] = df["turn_idx"].astype("Int32")
    pd.testing.assert_frame_equal(got[exp.columns], exp)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    log=event_logs(),
    snap_frac=st.floats(min_value=0.0, max_value=1.0),
    overlap_frac=st.floats(min_value=0.0, max_value=1.0),
)
def test_switchover_equals_reducer(ray_session, tmp_path_factory, log, snap_frac, overlap_frac):
    """Snapshot→CDC switchover over ARBITRARY little logs and ARBITRARY
    snapshot/overlap cuts (including cuts landing mid-DDL-schedule, empty
    snapshots, and full-overlap re-delivery) equals the sequential reducer."""
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.replay import replay_switchover
    from tapdata_connectors_ray.schema import TRANSCRIPTS_SCHEMA

    d = tmp_path_factory.mktemp("swprop")
    path = str(d / "events.parquet")
    table = _to_table(log)
    pq.write_table(table, path)

    exp = expected_final_state(TRANSCRIPTS_SCHEMA.empty_table(), table).to_pandas()
    got = replay_switchover(
        path,
        None,
        num_partitions=4,
        snapshot_frac=snap_frac,
        overlap_frac=overlap_frac,
        snapshot_dir=str(d / "snap"),
    ).to_pandas()
    if got.empty and len(got.columns) == 0:
        got = pd.DataFrame(columns=exp.columns).astype(exp.dtypes.to_dict())
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for df in (got, exp):
        df["turn_score"] = df["turn_score"].astype("Int64")
        df["turn_idx"] = df["turn_idx"].astype("Int32")
    pd.testing.assert_frame_equal(got, exp)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(log=event_logs(), data=st.data())
def test_time_travel_equals_prefix_reducer(ray_session, tmp_path_factory, log, data):
    """Time travel over ARBITRARY epoch boundaries: after N checkpointed
    ingests, ``dataset_at(epoch_i)`` must equal the sequential reducer run
    on the log PREFIX committed by epoch i — for every committed epoch,
    including empty epochs (duplicate bounds) and key-moving updates."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.incremental import CheckpointedIngest

    d = tmp_path_factory.mktemp("prop_tt")
    path = str(d / "events.parquet")
    table = _to_table(log)
    pq.write_table(table, path)
    max_lsn = max(r["lsn"] for r in log)

    n_bounds = data.draw(st.integers(min_value=1, max_value=3))
    bounds = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=max_lsn + 2),
                min_size=n_bounds, max_size=n_bounds,
            )
        )
    ) + [max_lsn + 10]

    ing = CheckpointedIngest(str(d / "lake"), num_partitions=4)
    manifests = [ing.ingest(path, None, end_lsn=int(b)) for b in bounds]

    base = EVENT_LOG_SCHEMA.empty_table().select(
        ["conv_id", "turn_idx", "role", "text", "tool", "turn_score", "ts"]
    ).cast(
        pa.schema(
            [
                pa.field("conv_id", pa.string()),
                pa.field("turn_idx", pa.int32()),
                pa.field("role", pa.string()),
                pa.field("text", pa.string()),
                pa.field("tool", pa.string()),
                pa.field("turn_score", pa.int32()),
                pa.field("ts", pa.timestamp("us")),
            ]
        )
    )
    for b, m in zip(bounds, manifests):
        prefix = table.filter(pc.less_equal(table["lsn"], b))
        exp = expected_final_state(base, prefix).to_pandas()
        got = ing.dataset_at(m.epoch).to_pandas()
        # the as-of read surfaces the schema IN EFFECT at that commit; the
        # reducer always emits the latest names — normalize the v3 rename
        # (these logs are all-v1, so values are identical either way)
        if "tool" in got.columns and "tool_name" not in got.columns:
            got = got.rename(columns={"tool": "tool_name"})
        if got.empty and len(got.columns) == 0:
            got = pd.DataFrame(columns=exp.columns).astype(exp.dtypes.to_dict())
        got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        for df in (got, exp):
            df["turn_score"] = df["turn_score"].astype("Int64")
            df["turn_idx"] = df["turn_idx"].astype("Int32")
        pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(log=event_logs())
def test_topic_sink_roundtrip_equals_direct_replay(ray_session, tmp_path_factory, log):
    """The distributed MQ producer sink as a replication channel: feeding
    the normalized change feed through write_topic_dataset -> poll ->
    replay of the consumed segments must equal the direct replay — for
    arbitrary little logs with dup LSNs, key moves and DDL."""
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.replay import (
        normalized_events,
        replay_final_state,
    )
    from tapdata_connectors_ray.sources.partitioned_log import (
        poll_topic,
        read_topic_segments,
        write_topic_dataset,
    )

    d = tmp_path_factory.mktemp("topic_prop")
    path = str(d / "events.parquet")
    pq.write_table(_to_table(log), path)

    def _sorted(df):
        if df.empty:  # all-tombstone logs: empty frame may carry no columns
            return df
        return df.sort_values(["conv_id", "turn_idx"], ignore_index=True)

    direct = _sorted(replay_final_state(path, None, num_partitions=8).to_pandas())

    topic = str(d / "topic")
    feed = normalized_events(path, None, prereduce=False)
    write_topic_dataset(
        feed, topic, "conv_id", n_partitions=4, rows_per_segment=16
    ).materialize()
    files, _ = poll_topic(topic)
    back = read_topic_segments(files)
    # apply the consumed feed: per-partition LWW merge, same as the lake
    from tapdata_connectors_ray.pipelines.replay import (
        replay_from_normalized,
        scan_evolution_plan_distributed,
    )

    got = _sorted(
        replay_from_normalized(back, scan_evolution_plan_distributed(path)).to_pandas()
    )
    if direct.empty or got.empty:
        assert len(direct) == len(got) == 0
        return
    pd.testing.assert_frame_equal(
        got[direct.columns.tolist()], direct, check_dtype=False
    )
