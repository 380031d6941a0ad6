"""Property test: the fused Arrow processor chain (``stages/processors.py``)
equals a row-at-a-time Python interpreter on randomly generated VALID chains
(rename/drop/select/filter/derive/tzshift) over random little tables with
null strings.  The generator tracks the live schema so every drawn step is
well-formed — what a config-driven sync task guarantees."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tapdata_connectors_ray.stages.processors import apply_chain

# column kinds in the symbolic schema the generator threads through
S, I, T = "str", "int", "ts"


@st.composite
def table_and_chain(draw):
    n = draw(st.integers(1, 25))
    rows = []
    for _ in range(n):
        rows.append(
            {
                "s1": draw(st.one_of(st.none(), st.sampled_from(["ab", "cde", "fg", ""]))),
                "s2": draw(st.sampled_from(["x", "yy", "zzz"])),
                "i1": draw(st.integers(0, 100)),
                "i2": draw(st.integers(1, 10)),
                "t1": draw(st.integers(0, 10**7)),  # µs since epoch
            }
        )
    schema = {"s1": S, "s2": S, "i1": I, "i2": I, "t1": T}
    chain = []
    fresh = iter(f"d{i}" for i in range(100))
    for _ in range(draw(st.integers(0, 6))):
        live = list(schema)
        op = draw(st.sampled_from(["rename", "drop", "select", "filter", "derive", "tzshift"]))
        if op == "rename":
            src = draw(st.sampled_from(live))
            dst = next(fresh)
            chain.append({"op": "rename", "from": src, "to": dst})
            schema[dst] = schema.pop(src)
        elif op == "drop" and len(live) > 1:
            c = draw(st.sampled_from(live))
            chain.append({"op": "drop", "cols": [c]})
            del schema[c]
        elif op == "select" and len(live) > 1:
            keep = draw(st.lists(st.sampled_from(live), min_size=1, unique=True))
            chain.append({"op": "select", "cols": keep})
            schema = {c: schema[c] for c in keep}
        elif op == "filter":
            ints = [c for c in live if schema[c] == I]
            strs = [c for c in live if schema[c] == S]
            cmp = draw(st.sampled_from(["eq", "ne", "lt", "le", "gt", "ge"]))
            if ints and draw(st.booleans()):
                chain.append(
                    {"op": "filter", "col": draw(st.sampled_from(ints)),
                     "cmp": cmp, "value": draw(st.integers(0, 100))}
                )
            elif strs:
                chain.append(
                    {"op": "filter", "col": draw(st.sampled_from(strs)),
                     "cmp": cmp, "value": draw(st.sampled_from(["ab", "x", "q"]))}
                )
        elif op == "derive":
            ints = [c for c in live if schema[c] == I]
            strs = [c for c in live if schema[c] == S]
            name = next(fresh)
            kind = draw(st.sampled_from(["add", "mul", "concat", "substr"]))
            if kind in ("add", "mul") and ints:
                chain.append(
                    {"op": "derive", "name": name,
                     "expr": {"kind": kind, "col": draw(st.sampled_from(ints)),
                              "by": draw(st.integers(0, 5))}}
                )
                schema[name] = I
            elif kind == "concat" and (ints or strs):
                cols = draw(st.lists(st.sampled_from(ints + strs), min_size=1, max_size=3))
                chain.append(
                    {"op": "derive", "name": name,
                     "expr": {"kind": "concat", "cols": cols, "sep": "-"}}
                )
                schema[name] = S
            elif strs:
                chain.append(
                    {"op": "derive", "name": name,
                     "expr": {"kind": "substr", "col": draw(st.sampled_from(strs)),
                              "start": draw(st.integers(0, 2)),
                              "len": draw(st.integers(0, 3))}}
                )
                schema[name] = S
        elif op == "tzshift":
            tss = [c for c in live if schema[c] == T]
            if tss:
                name = next(fresh)
                chain.append(
                    {"op": "tzshift", "col": draw(st.sampled_from(tss)),
                     "hours": draw(st.integers(-3, 3)), "name": name}
                )
                schema[name] = T
    return rows, chain


_CMP = {
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
}


def _interpret(rows: list[dict], chain: list[dict]) -> list[dict]:
    """Row-at-a-time reference interpreter (nulls: filter drops them,
    concat propagates them, substr passes them through)."""
    out = [dict(r) for r in rows]
    for step in chain:
        op = step["op"]
        if op == "rename":
            out = [
                {(step["to"] if k == step["from"] else k): v for k, v in r.items()}
                for r in out
            ]
        elif op == "drop":
            out = [{k: v for k, v in r.items() if k not in step["cols"]} for r in out]
        elif op == "select":
            out = [{k: r[k] for k in step["cols"]} for r in out]
        elif op == "filter":
            f = _CMP[step["cmp"]]
            out = [
                r for r in out
                if r[step["col"]] is not None and f(r[step["col"]], step["value"])
            ]
        elif op == "derive":
            e = step["expr"]
            for r in out:
                if e["kind"] == "add":
                    r[step["name"]] = r[e["col"]] + e["by"]
                elif e["kind"] == "mul":
                    r[step["name"]] = r[e["col"]] * e["by"]
                elif e["kind"] == "concat":
                    parts = [r[c] for c in e["cols"]]
                    r[step["name"]] = (
                        None
                        if any(p is None for p in parts)
                        else "-".join(str(p) for p in parts)
                    )
                elif e["kind"] == "substr":
                    s = r[e["col"]]
                    r[step["name"]] = (
                        None if s is None else s[e["start"] : e["start"] + e["len"]]
                    )
        elif op == "tzshift":
            for r in out:
                r[step["name"]] = r[step["col"]] + step["hours"] * 3_600_000_000
    return out


@given(table_and_chain())
@settings(max_examples=100, deadline=None)
def test_chain_matches_row_interpreter(tc):
    rows, chain = tc
    batch = pa.table(
        {
            "s1": pa.array([r["s1"] for r in rows], pa.string()),
            "s2": pa.array([r["s2"] for r in rows], pa.string()),
            "i1": pa.array([r["i1"] for r in rows], pa.int64()),
            "i2": pa.array([r["i2"] for r in rows], pa.int64()),
            "t1": pa.array([r["t1"] for r in rows], pa.timestamp("us")),
        }
    )
    got = apply_chain(batch, chain)
    exp = _interpret(rows, chain)

    assert got.num_rows == len(exp)
    for col in got.column_names:
        vals = got[col].to_pylist()
        want = [r[col] for r in exp]
        if got[col].type == pa.timestamp("us"):
            vals = [None if v is None else int(pd.Timestamp(v).value // 1000) for v in vals]
        assert vals == want, f"column {col}: {vals} != {want}\nchain={chain}"
