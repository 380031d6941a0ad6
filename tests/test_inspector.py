"""Inspect/diff verification stage (Tapdata data-verification drill-down):
classification of missing / extra / field-divergent keys, null-safe."""

import pandas as pd
import pyarrow as pa
import ray.data


def _diff(left_rows, right_rows, mode="full"):
    from tapdata_connectors_ray.stages.inspector import dataset_diff

    schema = pa.schema(
        [
            pa.field("k", pa.string()),
            pa.field("a", pa.string()),
            pa.field("b", pa.int64()),
        ]
    )
    l = ray.data.from_arrow(pa.Table.from_pylist(left_rows, schema=schema))
    r = ray.data.from_arrow(pa.Table.from_pylist(right_rows, schema=schema))
    out = dataset_diff(l, r, keys=["k"], compare_cols=["a", "b"], num_buckets=4, mode=mode)
    return out.to_pandas().sort_values("k").reset_index(drop=True)


import pytest


@pytest.mark.parametrize("mode", ["full", "hash_first"])
def test_diff_classification(ray_session, mode):
    left = [
        {"k": "same", "a": "x", "b": 1},
        {"k": "nulls", "a": None, "b": None},       # null == null: no diff
        {"k": "onlyl", "a": "x", "b": 1},
        {"k": "difa", "a": "x", "b": 1},
        {"k": "difboth", "a": "x", "b": 1},
        {"k": "nullvsval", "a": None, "b": 1},
    ]
    right = [
        {"k": "same", "a": "x", "b": 1},
        {"k": "nulls", "a": None, "b": None},
        {"k": "onlyr", "a": "y", "b": 2},
        {"k": "difa", "a": "X", "b": 1},
        {"k": "difboth", "a": "X", "b": 2},
        {"k": "nullvsval", "a": "v", "b": 1},
    ]
    got = _diff(left, right, mode=mode)
    m = dict(zip(got["k"], zip(got["diff_kind"], got["fields"])))
    assert "same" not in m and "nulls" not in m
    assert m["onlyl"] == ("peer_missing", "")
    assert m["onlyr"] == ("peer_only", "")
    assert m["difa"] == ("field_mismatch", "a")
    assert m["difboth"] == ("field_mismatch", "a,b")
    assert m["nullvsval"] == ("field_mismatch", "a")
    assert len(got) == 5


def test_inspect_fixture_kinds(ray_session):
    """The seeded peer lake must produce every diff kind, and the query's
    output must be discrepancy-scale (a small fraction of the table)."""
    from tapdata_connectors_ray.pipelines.entrypoints import q_cdc_inspect_diff

    got = q_cdc_inspect_diff("/root/testdata/sf0.001")
    kinds = set(got["diff_kind"])
    assert kinds == {"peer_missing", "peer_only", "field_mismatch"}
    assert (got[got["diff_kind"] == "peer_only"]["conv_id"].str.startswith("ghost-")).all()
    assert len(got) < 500  # discrepancy-scale, not table-scale


def test_diff_capture_roundtrip_small(ray_session):
    """diff_to_events(left, right) applied over right == left, exactly —
    including inserts, deletes, updates and null transitions."""
    import pyarrow as pa
    import ray.data

    from tapdata_connectors_ray.stages.inspector import (
        apply_change_events,
        diff_to_events,
    )

    schema = pa.schema(
        [
            pa.field("k", pa.string()),
            pa.field("a", pa.string()),
            pa.field("b", pa.int64()),
        ]
    )
    left_rows = [
        {"k": "keep", "a": "x", "b": 1},
        {"k": "upd", "a": "new", "b": 2},
        {"k": "ins", "a": "fresh", "b": 3},
        {"k": "tonull", "a": None, "b": None},
    ]
    right_rows = [
        {"k": "keep", "a": "x", "b": 1},
        {"k": "upd", "a": "old", "b": 9},
        {"k": "gone", "a": "dead", "b": 0},
        {"k": "tonull", "a": "val", "b": 7},
    ]
    l = ray.data.from_arrow(pa.Table.from_pylist(left_rows, schema=schema))
    r = ray.data.from_arrow(pa.Table.from_pylist(right_rows, schema=schema))
    events = diff_to_events(l, r, ["k"], ["a", "b"], num_buckets=4)
    ev_df = events.to_pandas()
    ops = dict(zip(ev_df["k"], ev_df["op"]))
    assert ops == {"upd": "U", "ins": "I", "gone": "D", "tonull": "U"}

    r2 = ray.data.from_arrow(pa.Table.from_pylist(right_rows, schema=schema))
    applied = apply_change_events(
        r2, ray.data.from_pandas(ev_df), ["k"], schema, num_buckets=4
    )
    got = applied.to_pandas().sort_values("k").reset_index(drop=True)
    exp = (
        pa.Table.from_pylist(left_rows, schema=schema)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp)


def test_hash_first_with_timestamp_and_int32_keys(ray_session):
    """Regression: the broadcast flag hashes must come from the ARROW key
    types — a pandas round-trip rewrites timestamp(us) keys to ns (and
    int-with-null to float), silently emptying the phase-2 hash prune."""
    from tapdata_connectors_ray.stages.inspector import dataset_diff

    schema = pa.schema(
        [
            pa.field("ts", pa.timestamp("us")),
            pa.field("seq", pa.int32()),
            pa.field("v", pa.string()),
        ]
    )

    def rows(vals):
        return [
            {"ts": 1_000_000 * i, "seq": i, "v": v} for i, v in enumerate(vals)
        ]

    l = ray.data.from_arrow(pa.Table.from_pylist(rows(["a", "b", "c", "d"]), schema=schema))
    r = ray.data.from_arrow(pa.Table.from_pylist(rows(["a", "X", "c", "Y"]), schema=schema))
    out = (
        dataset_diff(l, r, keys=["ts", "seq"], compare_cols=["v"], num_buckets=4)
        .to_pandas()
        .sort_values("seq")
        .reset_index(drop=True)
    )
    assert list(out["seq"]) == [1, 3]
    assert set(out["diff_kind"]) == {"field_mismatch"}
    assert set(out["fields"]) == {"v"}
