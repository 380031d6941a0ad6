"""Declarative row-processor chain: the config-driven transform nodes a sync
task DAG places between source and sink (the reference's processor family —
field rename / field calculation / row filter / type & timezone adjustment;
the JS processor's declarative subset, survey §2.11).

A chain is a JSON-able list of steps applied IN ORDER to every batch, each
step a vectorized Arrow kernel — the whole chain runs inside one
``map_batches`` with zero-copy input, so adding processors never adds a
pass over the data.

Steps:
  {"op": "rename", "from": c, "to": c2}
  {"op": "drop", "cols": [c, ...]}
  {"op": "select", "cols": [c, ...]}                 # projection + order
  {"op": "filter", "col": c, "cmp": eq|ne|lt|le|gt|ge, "value": v}
  {"op": "derive", "name": c, "expr": {"kind": "div"|"mul"|"add", "col": c0, "by": x}}
  {"op": "derive", "name": c, "expr": {"kind": "concat", "cols": [...], "sep": s}}
  {"op": "derive", "name": c, "expr": {"kind": "substr", "col": c0, "start": i, "len": n}}
  {"op": "tzshift", "col": c, "hours": h, "name": c2}  # timezone adjust
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_CMPS = {
    "eq": pc.equal,
    "ne": pc.not_equal,
    "lt": pc.less,
    "le": pc.less_equal,
    "gt": pc.greater,
    "ge": pc.greater_equal,
}

_ARITH = {"div": pc.divide, "mul": pc.multiply, "add": pc.add}


def _derive(batch: pa.Table, expr: dict) -> pa.Array:
    kind = expr["kind"]
    if kind in _ARITH:
        return _ARITH[kind](batch[expr["col"]], expr["by"])
    if kind == "concat":
        parts = [pc.cast(batch[c], pa.string()) for c in expr["cols"]]
        return pc.binary_join_element_wise(*parts, expr.get("sep", ""))
    if kind == "substr":
        return pc.utf8_slice_codeunits(
            batch[expr["col"]], expr["start"], expr["start"] + expr["len"]
        )
    raise ValueError(f"unknown derive kind {kind!r}")


def apply_chain(batch: pa.Table, chain: list[dict]) -> pa.Table:
    for step in chain:
        op = step["op"]
        if op == "rename":
            batch = batch.rename_columns(
                [step["to"] if c == step["from"] else c for c in batch.column_names]
            )
        elif op == "drop":
            batch = batch.drop_columns([c for c in step["cols"] if c in batch.column_names])
        elif op == "select":
            batch = batch.select(step["cols"])
        elif op == "filter":
            batch = batch.filter(_CMPS[step["cmp"]](batch[step["col"]], step["value"]))
        elif op == "derive":
            batch = batch.append_column(step["name"], _derive(batch, step["expr"]))
        elif op == "tzshift":
            shifted = pc.add(
                batch[step["col"]].cast(pa.int64()),
                int(step["hours"]) * 3_600_000_000,
            ).cast(pa.timestamp("us"))
            name = step.get("name", step["col"])
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.schema.get_field_index(name), name, shifted
                )
            else:
                batch = batch.append_column(name, shifted)
        else:
            raise ValueError(f"unknown processor op {op!r}")
    return batch


def processor_stage(ds: ray.data.Dataset, chain: list[dict]) -> ray.data.Dataset:
    """The whole chain as ONE zero-copy ``map_batches`` stage."""

    def run(batch: pa.Table) -> pa.Table:
        return apply_chain(batch, chain)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)
