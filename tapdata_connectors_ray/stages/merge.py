"""Merge stage: per-partition last-writer-wins upsert apply, table-generic.

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
- output is sorted by the key columns — global order is unnecessary because
  partitions are key-disjoint (survey §7.2).

Every function is parameterized by ``keys`` — the engine's ``TableSpec``
analogue of the reference deriving key/column lists per table at runtime
(``NormalWriteRecorder.java:64-79``).  ``keys`` defaults to the transcripts
north-star key for the existing call sites.

Write policies (:func:`policy_collapse`) replay the reference's policy
matrix (``WritePolicyEnum.java:3-22``; insert dispatch
``NormalWriteRecorder.java:194-245``, update dispatch ``:305-357``)
vectorized per partition.
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


def _dedup_replays(df: pd.DataFrame, keys: list[str] | None = None) -> pd.DataFrame:
    """Drop verbatim duplicate-LSN replays.  Key included because the base
    snapshot legitimately shares LSN 0 across keys."""
    return df.drop_duplicates(["lsn", *(keys or KEYS)], keep="first")


def _to_table(df: pd.DataFrame, schema: pa.Schema, keys: list[str] | None = None) -> pa.Table:
    df = df.sort_values(keys or KEYS, kind="stable")
    arrays = []
    for f in schema:
        col = df[f.name]
        if pa.types.is_integer(f.type) and col.dtype.kind == "f":
            col = col.astype("Int64")
        arrays.append(pa.array(col, type=f.type, from_pandas=True))
    return pa.Table.from_arrays(arrays, schema=schema)


def lww_collapse(
    df: pd.DataFrame, drop_tombstones: bool = True, keys: list[str] | None = None
) -> pd.DataFrame:
    keys = keys or KEYS
    df = _dedup_replays(df, keys)
    df = df.sort_values("lsn", kind="stable").drop_duplicates(keys, keep="last")
    if drop_tombstones:
        df = df[df["op"] != "D"]
    return df


def lww_keep_indices(
    t: pa.Table, keys: list[str], drop_tombstones: bool = True
) -> np.ndarray:
    """Row indices surviving dedup + LWW + tombstone-drop, computed over the
    NARROW key columns only — the wide text payload is then selected with a
    zero-copy-ish Arrow ``take`` instead of being round-tripped through
    pandas object strings.  Pandas drop_duplicates treats NaN/None as equal,
    which is exactly the null-safe key matching the no-PK fallback needs."""
    cols = {k: t[k].to_numpy(zero_copy_only=False) for k in keys}
    df = pd.DataFrame(
        {**cols, "__lsn": t["lsn"].to_numpy(), "__op": t["op"].to_numpy(zero_copy_only=False)}
    )
    df = df.drop_duplicates(["__lsn", *keys], keep="first")
    df = df.sort_values("__lsn", kind="stable").drop_duplicates(keys, keep="last")
    if drop_tombstones:
        df = df[df["__op"] != "D"]
    return df.index.to_numpy()


def make_lww_merge(
    payload_schema: pa.Schema, keys: list[str] | None = None
) -> Callable[[pa.Table], pa.Table]:
    """Final merge for one partition: dedup -> LWW per key -> drop tombstones.
    Operates on Arrow groups (``map_groups(batch_format="pyarrow")``):
    indices from the narrow key columns, payload via ``take`` + Arrow sort."""
    keys = keys or KEYS
    out_schema = merged_schema(payload_schema)
    out_names = [f.name for f in out_schema]
    sort_keys = [(k, "ascending") for k in keys]

    def lww_merge_group(t: pa.Table) -> pa.Table:
        idx = lww_keep_indices(t, keys)
        out = t.select(out_names).take(np.sort(idx))
        for f in out_schema:
            if not out.schema.field(f.name).type.equals(f.type):
                i = out.schema.get_field_index(f.name)
                out = out.set_column(i, f.name, out[f.name].cast(f.type, safe=True))
        return out.sort_by(sort_keys)

    return lww_merge_group


def lww_merge_tables(
    tables: list[pa.Table],
    out_schema: pa.Schema,
    keys: list[str],
    drop_tombstones: bool = True,
) -> pa.Table:
    """Arrow-native merge of event/lake-file tables: concat -> dedup + LWW
    over the NARROW key columns -> zero-copy-ish ``take`` of survivors ->
    cast -> key sort.  The wide payload never round-trips through pandas
    object strings (the ``make_lww_merge`` trick, shared with the
    incremental writer/reader/compactor paths)."""
    names = [f.name for f in out_schema]
    parts = []
    for t in tables:
        if "op" not in t.column_names:  # compacted files predating the op column
            t = t.append_column(
                "op", pa.array(np.full(len(t), "I", dtype=object), pa.string())
            )
        parts.append(t.select(names))
    t = parts[0] if len(parts) == 1 else pa.concat_tables(parts, promote_options="default")
    idx = lww_keep_indices(t, keys, drop_tombstones=drop_tombstones)
    out = t.take(np.sort(idx))
    for f in out_schema:
        if not out.schema.field(f.name).type.equals(f.type):
            i = out.schema.get_field_index(f.name)
            out = out.set_column(i, f.name, out[f.name].cast(f.type, safe=True))
    return out.sort_by([(k, "ascending") for k in keys])


def make_lww_premerge(keys: list[str] | None = None) -> Callable[[pa.Table], pa.Table]:
    """Salted pre-merge: same LWW collapse but tombstones are RETAINED — a
    delete must survive to the final merge to beat older upserts (the
    ClickHouse ``is_deleted``-row precedent; dropping it early would
    resurrect rows).  Arrow-native (narrow-index + take), salt dropped."""
    keys = keys or KEYS

    def lww_premerge_group(t: pa.Table) -> pa.Table:
        idx = lww_keep_indices(t, keys, drop_tombstones=False)
        out = t.take(np.sort(idx))
        if "salt" in out.column_names:
            out = out.drop_columns(["salt"])
        return out

    return lww_premerge_group


# transcripts-keyed instance for existing call sites
lww_premerge_group = make_lww_premerge()


def make_write_counters(keys: list[str] | None = None) -> Callable[[pd.DataFrame], pa.Table]:
    """Per-partition write counters (``WriteListResult`` analogue,
    ``NormalRecordWriter.java:120-153``), replayed exactly: per key in LSN
    order, I/U on a missing key counts as inserted, on a live key as
    modified; D on a live key as removed.  Order-sensitive per key only, so
    a partition-local vectorized pass reproduces the sequential counters."""
    keys = keys or KEYS

    def write_counters_group(df: pd.DataFrame) -> pa.Table:
        pid = int(df["partition_id"].iloc[0]) if len(df) else -1
        before = len(df)
        d = _dedup_replays(df, keys)
        skipped = before - len(d)
        d = d.sort_values([*keys, "lsn"], kind="stable")
        prev_op = d.groupby(keys, sort=False, dropna=False)["op"].shift()
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

    return write_counters_group


write_counters_group = make_write_counters()


def max_lsn_of_group(df: pd.DataFrame) -> np.int64:
    return np.int64(df["lsn"].max()) if len(df) else np.int64(-1)


# ---------------------------------------------------------------------------
# Write-policy matrix (WritePolicyEnum.java:3-22)
# ---------------------------------------------------------------------------

INSERT_POLICIES = ("update_on_exists", "ignore_on_exists", "just_insert")
UPDATE_POLICIES = ("insert_on_nonexists", "ignore_on_nonexists")


def policy_collapse(
    df: pd.DataFrame,
    keys: list[str],
    insert_policy: str = "update_on_exists",
    update_policy: str = "insert_on_nonexists",
    drop_tombstones: bool = True,
) -> pd.DataFrame:
    """Policy-aware replay of one partition's events, vectorized.

    Semantics per key in LSN order, mirroring the reference's dispatch
    (insert side ``NormalWriteRecorder.java:194-245``, update side
    ``:305-357``):

    - ``I`` on a live key: replace (``update_on_exists``), skip
      (``ignore_on_exists`` — first writer wins), or replace
      (``just_insert`` maps to blind upsert in a keyed lake).
    - ``U`` on a dead/absent key: create (``insert_on_nonexists``) or skip
      (``ignore_on_nonexists``).
    - ``D``: kill the key (no-op when already dead).

    The default pair (update_on_exists, insert_on_nonexists) degenerates to
    plain LWW — the fast path used by the main replay.

    Vectorization: "aliveness-affecting" events are all I and D, plus U iff
    it can create.  A key is alive before event e iff the latest affecting
    event before e is not D.  The surviving row is the max-LSN event that
    *wrote* (I that applied, U that applied) while its key ends alive.
    """
    if insert_policy not in INSERT_POLICIES:
        raise ValueError(f"unknown insert policy {insert_policy}")
    if update_policy not in UPDATE_POLICIES:
        raise ValueError(f"unknown update policy {update_policy}")
    if insert_policy != "ignore_on_exists" and update_policy == "insert_on_nonexists":
        return lww_collapse(df, drop_tombstones=drop_tombstones, keys=keys)
    narrow = df[[*keys, "lsn", "op"]].reset_index(drop=True)
    pos = _policy_keep_positions(
        narrow, keys, insert_policy, update_policy, drop_tombstones
    )
    return df.iloc[pos]


def _policy_keep_positions(
    d: pd.DataFrame,
    keys: list[str],
    insert_policy: str,
    update_policy: str,
    drop_tombstones: bool,
) -> np.ndarray:
    """Core of :func:`policy_collapse` over a NARROW (keys, lsn, op) frame
    with a positional RangeIndex; returns the surviving row positions so the
    caller attaches the wide payload with ``iloc`` / Arrow ``take``."""
    d = _dedup_replays(d, keys).sort_values([*keys, "lsn"], kind="stable")
    op = d["op"].to_numpy()
    is_i, is_u, is_d = op == "I", op == "U", op == "D"
    u_creates = update_policy == "insert_on_nonexists"
    affecting = is_i | is_d | (is_u if u_creates else False)

    # last affecting op at-or-before each row, per key (ffill within groups)
    gid = d.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
    aff_op = pd.Series(np.where(affecting, op, None), index=d.index, dtype=object)
    last_aff = aff_op.groupby(gid).ffill()
    prev_aff = last_aff.groupby(gid).shift()
    alive_before = (prev_aff.notna() & (prev_aff != "D")).to_numpy()

    writes = (
        is_i & (~alive_before | (insert_policy != "ignore_on_exists"))
    ) | (is_u & (alive_before | u_creates))

    # final aliveness per key = last affecting op != D
    last_aff_final = last_aff.groupby(gid).transform("last")
    key_alive = (last_aff_final.notna() & (last_aff_final != "D")).to_numpy()

    keep = d[writes & key_alive]
    out = keep.sort_values("lsn", kind="stable").drop_duplicates(keys, keep="last")
    idx = out.index.to_numpy()
    if not drop_tombstones:
        # also surface a tombstone row for keys that end dead (delta mode)
        dead = d[is_d & ~key_alive].sort_values("lsn", kind="stable")
        dead = dead.drop_duplicates(keys, keep="last")
        idx = np.concatenate([idx, dead.index.to_numpy()])
    return idx


def policy_keep_indices(
    t: pa.Table,
    keys: list[str],
    insert_policy: str = "update_on_exists",
    update_policy: str = "insert_on_nonexists",
    drop_tombstones: bool = True,
) -> np.ndarray:
    """Policy-matrix winners computed over the NARROW key/lsn/op columns
    only — :func:`lww_keep_indices` extended to the full write-policy
    dispatch, so the policy replay's wide payload rides an Arrow ``take``
    instead of a pandas object round-trip."""
    if insert_policy not in INSERT_POLICIES:
        raise ValueError(f"unknown insert policy {insert_policy}")
    if update_policy not in UPDATE_POLICIES:
        raise ValueError(f"unknown update policy {update_policy}")
    if insert_policy != "ignore_on_exists" and update_policy == "insert_on_nonexists":
        return lww_keep_indices(t, keys, drop_tombstones=drop_tombstones)
    narrow = pd.DataFrame(
        {
            **{k: t[k].to_numpy(zero_copy_only=False) for k in keys},
            "lsn": t["lsn"].to_numpy(),
            "op": t["op"].to_numpy(zero_copy_only=False),
        }
    )
    return _policy_keep_positions(
        narrow, keys, insert_policy, update_policy, drop_tombstones
    )
