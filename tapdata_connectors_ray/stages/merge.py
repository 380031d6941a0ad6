"""Merge stage: per-partition last-writer-wins upsert apply.

The distributed analogue of the reference's ordered target writer
(``NormalRecordWriter.java:66-153``) under the LWW-by-version merge rule the
survey maps it onto (ClickHouse ``ReplacingMergeTree`` + version column,
``ClickhouseConnector.java:265-287``; Hudi upsert client,
``HuDiWriteBySparkClient.java:210-268``):

- one group = one hash partition of the key space (all events of a key are
  co-located by the single shuffle, survey §7.3);
- within the group: exact-duplicate replays are dropped (idempotent dedup on
  the ``exactlyOnceId``/LSN, survey §2.7), then each key keeps its max-LSN
  event (LWW), then tombstones (op == "D") are dropped;
- output is sorted by (conv_id, turn_idx) — global order is unnecessary
  because partitions are disjoint by conv_id hash (survey §7.2).

The merged-row schema is *plan-driven* (the lake's schema as of the epoch
being applied), so the merge functions are factories over a payload schema.
Everything is vectorized pandas; the functions run inside
``groupby(...).map_groups`` tasks.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from tapdata_connectors_ray.schema import KEY_COLUMNS

KEYS = list(KEY_COLUMNS)

COUNTER_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int32()),
        pa.field("inserted", pa.int64()),
        pa.field("modified", pa.int64()),
        pa.field("removed", pa.int64()),
        pa.field("skipped_duplicates", pa.int64()),
    ]
)


def merged_schema(payload_schema: pa.Schema) -> pa.Schema:
    """Lake partition file schema: payload + engine columns (lsn keeps LWW
    comparable across epochs; op lets delta files carry live tombstones;
    partition_id keeps the file self-describing)."""
    return pa.schema(
        list(payload_schema)
        + [
            pa.field("lsn", pa.int64()),
            pa.field("op", pa.string()),
            pa.field("partition_id", pa.int32()),
        ]
    )


def _dedup_replays(df: pd.DataFrame) -> pd.DataFrame:
    """Drop verbatim duplicate-LSN replays.  Key included because the base
    snapshot legitimately shares LSN 0 across keys."""
    return df.drop_duplicates(["lsn", *KEYS], keep="first")


def _to_table(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    df = df.sort_values(KEYS, kind="stable")
    arrays = []
    for f in schema:
        col = df[f.name]
        if pa.types.is_integer(f.type) and col.dtype.kind == "f":
            col = col.astype("Int64")
        arrays.append(pa.array(col, type=f.type, from_pandas=True))
    return pa.Table.from_arrays(arrays, schema=schema)


def lww_collapse(df: pd.DataFrame, drop_tombstones: bool = True) -> pd.DataFrame:
    df = _dedup_replays(df)
    df = df.sort_values("lsn", kind="stable").drop_duplicates(KEYS, keep="last")
    if drop_tombstones:
        df = df[df["op"] != "D"]
    return df


def lww_keep_indices(
    conv: np.ndarray, turn: np.ndarray, lsn: np.ndarray, op: np.ndarray,
    drop_tombstones: bool = True,
) -> np.ndarray:
    """Row indices surviving dedup + LWW + tombstone-drop, computed over the
    NARROW key columns only — the wide text payload is then selected with a
    zero-copy-ish Arrow ``take`` instead of being round-tripped through
    pandas object strings."""
    df = pd.DataFrame({"c": conv, "t": turn, "l": lsn, "o": op})
    df = df.drop_duplicates(["l", "c", "t"], keep="first")
    df = df.sort_values("l", kind="stable").drop_duplicates(["c", "t"], keep="last")
    if drop_tombstones:
        df = df[df["o"] != "D"]
    return df.index.to_numpy()


def make_lww_merge(payload_schema: pa.Schema) -> Callable[[pa.Table], pa.Table]:
    """Final merge for one partition: dedup -> LWW per key -> drop tombstones.
    Operates on Arrow groups (``map_groups(batch_format="pyarrow")``):
    indices from the narrow key columns, payload via ``take`` + Arrow sort."""
    out_schema = merged_schema(payload_schema)
    out_names = [f.name for f in out_schema]

    def lww_merge_group(t: pa.Table) -> pa.Table:
        idx = lww_keep_indices(
            t["conv_id"].to_numpy(zero_copy_only=False),
            t["turn_idx"].to_numpy(zero_copy_only=False),
            t["lsn"].to_numpy(zero_copy_only=False),
            t["op"].to_numpy(zero_copy_only=False),
        )
        out = t.select(out_names).take(np.sort(idx))
        for f in out_schema:
            if not out.schema.field(f.name).type.equals(f.type):
                i = out.schema.get_field_index(f.name)
                out = out.set_column(i, f.name, out[f.name].cast(f.type, safe=True))
        return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])

    return lww_merge_group


def lww_premerge_group(t: pa.Table) -> pa.Table:
    """Salted pre-merge: same LWW collapse but tombstones are RETAINED — a
    delete must survive to the final merge to beat older upserts (the
    ClickHouse ``is_deleted``-row precedent; dropping it early would
    resurrect rows).  Arrow-native (narrow-index + take), salt dropped."""
    idx = lww_keep_indices(
        t["conv_id"].to_numpy(zero_copy_only=False),
        t["turn_idx"].to_numpy(zero_copy_only=False),
        t["lsn"].to_numpy(zero_copy_only=False),
        t["op"].to_numpy(zero_copy_only=False),
        drop_tombstones=False,
    )
    out = t.take(np.sort(idx))
    if "salt" in out.column_names:
        out = out.drop_columns(["salt"])
    return out


def write_counters_group(df: pd.DataFrame) -> pa.Table:
    """Per-partition write counters (``WriteListResult`` analogue,
    ``NormalRecordWriter.java:120-153``), replayed exactly: per key in LSN
    order, I/U on a missing key counts as inserted, on a live key as
    modified; D on a live key as removed.  Order-sensitive per key only, so
    a partition-local vectorized pass reproduces the sequential counters."""
    pid = int(df["partition_id"].iloc[0]) if len(df) else -1
    before = len(df)
    d = _dedup_replays(df)
    skipped = before - len(d)
    d = d.sort_values([*KEYS, "lsn"], kind="stable")
    prev_op = d.groupby(KEYS, sort=False)["op"].shift()
    prev_alive = prev_op.notna() & (prev_op != "D")
    is_dml = d["op"] != "D"
    return pa.Table.from_pydict(
        {
            "partition_id": [pid],
            "inserted": [int((is_dml & ~prev_alive).sum())],
            "modified": [int((is_dml & prev_alive).sum())],
            "removed": [int((~is_dml & prev_alive).sum())],
            "skipped_duplicates": [int(skipped)],
        },
        schema=COUNTER_SCHEMA,
    )


def max_lsn_of_group(df: pd.DataFrame) -> np.int64:
    return np.int64(df["lsn"].max()) if len(df) else np.int64(-1)
