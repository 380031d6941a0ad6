"""Portable type lattice + codec registry.

The reference's TapType system (survey §1.3; factory methods
``ConnectorBase.java:138-180``) carries values portably between stores, with
a per-connector codec registry bridging portable and native representations
— e.g. MySQL serializes TapMap/TapArray to JSON text, encodes booleans as
tinyint(1), formats datetimes at µs precision
(``MysqlConnector.java:188-228``).

Here the portable representation IS Arrow (survey §1.5 mapping), and the
codec registry converts an Arrow table to/from a "lowest common denominator"
target dialect (string/number-only columns, the JSON-text convention) —
vectorized per batch, exact round-trip for every lattice type.
"""

from __future__ import annotations

import json
from datetime import date, datetime, time, timedelta, timezone
from decimal import Decimal

import numpy as np
import pyarrow as pa

# TapType -> Arrow (survey §1.5): the portable lattice
TAP_TO_ARROW: dict[str, pa.DataType] = {
    "TapString": pa.string(),
    "TapNumber.int32": pa.int32(),
    "TapNumber.int64": pa.int64(),
    "TapNumber.float64": pa.float64(),
    "TapNumber.decimal": pa.decimal128(18, 4),
    "TapBoolean": pa.bool_(),
    "TapBinary": pa.binary(),
    "TapDate": pa.date32(),
    "TapTime": pa.time64("us"),
    "TapDateTime": pa.timestamp("us"),
    "TapYear": pa.int16(),
    "TapArray": pa.list_(pa.int64()),
    "TapMap": pa.map_(pa.string(), pa.string()),
    # timezone-aware datetimes: portable = UTC µs; the target dialect renders
    # them in the connection's timezone offset and the decode path converts
    # back (the MysqlReader.java:788-849 offset math)
    "TapDateTime.tz": pa.timestamp("us", tz="UTC"),
    # illegal-date preservation (TapIllegalDate round-trip,
    # MysqlConnector.java:510-597, MysqlReader.java:597-630): a source value
    # either parses to a real timestamp or its raw bytes are carried verbatim
    "TapDateTime.illegal": pa.struct([("ts", pa.timestamp("us")), ("raw", pa.string())]),
}

# the target connection's display offset for tz-aware datetimes (+05:30 —
# a half-hour zone exercises the non-trivial offset math)
TARGET_TZ = timezone(timedelta(minutes=330))


def _encode_column(col: pa.ChunkedArray | pa.Array, t: pa.DataType) -> pa.Array:
    """Portable Arrow column -> target-dialect column (JSON-text convention
    for nested types, tinyint bools, µs-precision ISO datetimes)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_boolean(t):
        return col.cast(pa.int8())  # tinyint(1) convention
    if pa.types.is_list(t):
        return pa.array(
            [None if v is None else json.dumps(v) for v in col.to_pylist()], pa.string()
        )
    if pa.types.is_map(t):
        return pa.array(
            [
                None if v is None else json.dumps(dict(v), sort_keys=True)
                for v in col.to_pylist()
            ],
            pa.string(),
        )
    if pa.types.is_struct(t):  # illegal-date carrier: raw wins verbatim
        return pa.array(
            [
                None
                if v is None
                else (
                    v["raw"]
                    if v["raw"] is not None
                    else v["ts"].isoformat(timespec="microseconds")
                )
                for v in col.to_pylist()
            ],
            pa.string(),
        )
    if pa.types.is_timestamp(t):
        if t.tz is not None:
            # render in the connection's offset; portable value stays UTC
            return pa.array(
                [
                    None
                    if v is None
                    else v.astimezone(TARGET_TZ).isoformat(timespec="microseconds")
                    for v in col.to_pylist()
                ],
                pa.string(),
            )
        return pa.array(
            [None if v is None else v.isoformat(timespec="microseconds")
             for v in col.to_pylist()],
            pa.string(),
        )
    if pa.types.is_time(t):
        return pa.array(
            [None if v is None else v.isoformat() for v in col.to_pylist()], pa.string()
        )
    if pa.types.is_date(t):
        return pa.array(
            [None if v is None else v.isoformat() for v in col.to_pylist()], pa.string()
        )
    if pa.types.is_decimal(t):
        return pa.array(
            [None if v is None else str(v) for v in col.to_pylist()], pa.string()
        )
    if pa.types.is_binary(t):
        return pa.array(
            [None if v is None else v.hex() for v in col.to_pylist()], pa.string()
        )
    return col  # strings / ints / floats pass through natively


def _decode_column(col: pa.ChunkedArray | pa.Array, t: pa.DataType) -> pa.Array:
    """Target-dialect column -> portable Arrow column (exact inverse)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vals = col.to_pylist()
    if pa.types.is_boolean(t):
        return col.cast(pa.bool_())
    if pa.types.is_list(t):
        return pa.array([None if v is None else json.loads(v) for v in vals], t)
    if pa.types.is_map(t):
        return pa.array(
            [None if v is None else sorted(json.loads(v).items()) for v in vals], t
        )
    if pa.types.is_struct(t):
        def _parse(v):
            if v is None:
                return None
            try:
                return {"ts": datetime.fromisoformat(v), "raw": None}
            except ValueError:  # unparseable source date -> preserved verbatim
                return {"ts": None, "raw": v}

        return pa.array([_parse(v) for v in vals], t)
    if pa.types.is_timestamp(t):
        if t.tz is not None:
            return pa.array(
                [
                    None
                    if v is None
                    else datetime.fromisoformat(v).astimezone(timezone.utc)
                    for v in vals
                ],
                t,
            )
        return pa.array(
            [None if v is None else datetime.fromisoformat(v) for v in vals], t
        )
    if pa.types.is_time(t):
        return pa.array([None if v is None else time.fromisoformat(v) for v in vals], t)
    if pa.types.is_date(t):
        return pa.array([None if v is None else date.fromisoformat(v) for v in vals], t)
    if pa.types.is_decimal(t):
        return pa.array([None if v is None else Decimal(v) for v in vals], t)
    if pa.types.is_binary(t):
        return pa.array([None if v is None else bytes.fromhex(v) for v in vals], t)
    return col.cast(t)


def encode_for_target(table: pa.Table, portable_schema: pa.Schema) -> pa.Table:
    """Portable table -> target dialect (the write-side codec pass)."""
    cols = [
        _encode_column(table[f.name], f.type) for f in portable_schema
    ]
    return pa.table(dict(zip(portable_schema.names, cols)))


def decode_from_target(table: pa.Table, portable_schema: pa.Schema) -> pa.Table:
    """Target dialect -> portable table (the read-side codec pass)."""
    cols = [_decode_column(table[f.name], f.type) for f in portable_schema]
    return pa.Table.from_arrays(cols, schema=portable_schema)


def lattice_sample_table(n: int = 64, seed: int = 11) -> pa.Table:
    """Deterministic sample covering every lattice type, nulls included."""
    rng = np.random.default_rng(seed)
    null_at = lambda i: i % 7 == 3  # noqa: E731

    def mk(vals):
        return [None if null_at(i) else v for i, v in enumerate(vals)]

    data = {
        "TapString": mk([f"s-{i}" for i in range(n)]),
        "TapNumber.int32": mk(rng.integers(-(2**31), 2**31 - 1, n).tolist()),
        "TapNumber.int64": mk(rng.integers(-(2**62), 2**62, n).tolist()),
        "TapNumber.float64": mk((rng.random(n) * 1e6).tolist()),
        "TapNumber.decimal": mk([Decimal(int(x)) / 10000 for x in rng.integers(-10**12, 10**12, n)]),
        "TapBoolean": mk((rng.random(n) < 0.5).tolist()),
        "TapBinary": mk([bytes(rng.integers(0, 256, 8, dtype=np.uint8)) for _ in range(n)]),
        "TapDate": mk([date(2000 + i % 30, 1 + i % 12, 1 + i % 28) for i in range(n)]),
        "TapTime": mk([time(i % 24, i % 60, i % 60, (i * 123457) % 1_000_000) for i in range(n)]),
        "TapDateTime": mk(
            [datetime(2020, 1 + i % 12, 1 + i % 28, i % 24, i % 60, i % 60,
                      (i * 999983) % 1_000_000) for i in range(n)]
        ),
        "TapYear": mk([(1950 + i) % 2100 for i in range(n)]),
        "TapArray": mk([list(range(i % 5)) for i in range(n)]),
        "TapMap": mk([[(f"k{j}", f"v{i}-{j}") for j in range(i % 3)] for i in range(n)]),
        "TapDateTime.tz": mk(
            [datetime(2021, 1 + i % 12, 1 + i % 28, i % 24, i % 60, tzinfo=timezone.utc)
             for i in range(n)]
        ),
        "TapDateTime.illegal": mk(
            [
                {"ts": None, "raw": "0000-00-00 00:00:00"}
                if i % 5 == 0
                else {"ts": None, "raw": f"2024-02-3{i % 2} 12:00:00"}
                if i % 5 == 1
                else {"ts": datetime(2022, 1 + i % 12, 1 + i % 28, i % 24), "raw": None}
                for i in range(n)
            ]
        ),
    }
    schema = pa.schema([pa.field(k, TAP_TO_ARROW[k]) for k in data])
    return pa.table({k: pa.array(v, schema.field(k).type) for k, v in data.items()},
                    schema=schema)
