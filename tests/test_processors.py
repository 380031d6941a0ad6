"""Declarative processor chain: per-step semantics + fused-chain behavior."""

import pyarrow as pa
import pytest

from tapdata_connectors_ray.stages.processors import apply_chain


@pytest.fixture()
def batch():
    return pa.table(
        {
            "a": pa.array(["x", "y", "z"], pa.string()),
            "n": pa.array([100, 250, 999], pa.int64()),
            "ts": pa.array([0, 3_600_000_000, 7_200_000_000], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )


def test_rename_drop_select(batch):
    out = apply_chain(batch, [
        {"op": "rename", "from": "a", "to": "alpha"},
        {"op": "select", "cols": ["n", "alpha"]},
    ])
    assert out.column_names == ["n", "alpha"]


def test_filter_and_derives(batch):
    out = apply_chain(batch, [
        {"op": "filter", "col": "n", "cmp": "lt", "value": 999},
        {"op": "derive", "name": "usd", "expr": {"kind": "div", "col": "n", "by": 100.0}},
        {"op": "derive", "name": "k", "expr": {"kind": "concat", "cols": ["a", "a"], "sep": "-"}},
        {"op": "derive", "name": "s", "expr": {"kind": "substr", "col": "k", "start": 0, "len": 1}},
    ])
    assert out["usd"].to_pylist() == [1.0, 2.5]
    assert out["k"].to_pylist() == ["x-x", "y-y"]
    assert out["s"].to_pylist() == ["x", "y"]


def test_tzshift_inplace_and_new_column(batch):
    out = apply_chain(batch, [{"op": "tzshift", "col": "ts", "hours": 1}])
    assert out["ts"][0].as_py().hour == 1
    out2 = apply_chain(batch, [{"op": "tzshift", "col": "ts", "hours": -1, "name": "t2"}])
    assert out2["t2"][1].as_py().hour == 0
    assert out2["ts"][1].as_py().hour == 1  # original untouched


def test_unknown_op_raises(batch):
    with pytest.raises(ValueError):
        apply_chain(batch, [{"op": "frobnicate"}])
