"""Normalize stage: schema rewrite + key hashing + within-batch pre-reduce.

The stateless front of the replay pipeline (survey §7.2).  Per Arrow batch
(zero-copy from the object store):

1. drop DDL rows (they were folded into the EvolutionPlan by a pruned scan);
2. rewrite mixed-version rows to the plan's current schema (vectorized,
   registry.py) — the plan may be *truncated* to an epoch's end LSN, so the
   output schema is the lake's schema **as of that epoch**, not a
   look-ahead final schema (live-tail never sees future DDL);
3. expand key-changing updates: an update whose ``before_<key>`` image names
   a different key becomes a synthetic tombstone at the old key + the upsert
   at the new key (the reference carries before+after images for exactly
   this, ``MysqlReader.java:646-668``);
4. filter rows at-or-below the per-partition applied-LSN watermark (the
   idempotent-resume path — the dedup-ledger half the reference delegates to
   its engine, survey §2.7);
5. **pre-reduce**: keep only the max-LSN row per key within the batch — the
   combiner that shrinks hot-key traffic before the one shuffle (north-rule
   skew defense; analogous to the reference's within-batch same-op run
   batching, ``NormalWriteRecorder.java:87-118``);
6. attach ``partition_id = stable_hash(partition_cols) % P`` — the shuffle key.

Key and partition columns come from the plan's :class:`TableSpec` — the
stage is table-generic (``NormalWriteRecorder.java:64-79`` derives key
lists per table the same way).

Implemented as callable classes used as ``map_batches`` UDFs: plan /
watermarks deserialize once per task, and the heavy work is Arrow/numpy
kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from tapdata_connectors_ray.functions.hashing import (
    key_hash_columns,
    partition_ids_for,
)
from tapdata_connectors_ray.state.registry import EvolutionPlan


def prereduce_indices(key_cols: dict[str, np.ndarray], lsn: np.ndarray) -> np.ndarray:
    """Row indices keeping one (max-LSN) row per key, in ascending row order.

    Works on narrow key columns only so the wide payload is never converted —
    the surviving rows are selected from the Arrow table with ``take``.
    Pandas drop_duplicates treats NaN/None as equal: null-safe keys.
    """
    df = pd.DataFrame({**key_cols, "__lsn": lsn})
    df = df.sort_values("__lsn", kind="stable")
    keep = df.drop_duplicates(list(key_cols), keep="last").index.to_numpy()
    keep.sort()
    return keep


def _salt_column(batch: pa.Table, keys: list[str], salt_buckets: int) -> pa.Array:
    """Sub-bucket *within* a partition, keyed per full key so the salted
    pre-merge still fully collapses each key (north-rule skew salt: spread a
    hot partition's keys across workers, then combine)."""
    h = key_hash_columns(batch, keys)
    return pa.array((h % np.uint64(salt_buckets)).astype(np.int32), pa.int32())


_VALID_OPS = ("I", "U", "D")


def malformed_reasons(batch: pa.Table, spec) -> pa.Array | None:
    """Per-row DLQ reason (NULL = well-formed), vectorized: ``bad_op`` for
    unknown op codes (DDL rows must be filtered out first), ``null_key`` for
    DML carrying a NULL explicit key (no-PK specs key null-safely on all
    columns, so the check only applies to explicit keys).  Returns None when
    the spec can produce no malformed class (nothing to scan)."""
    op_ok = pc.is_in(batch["op"], value_set=pa.array(_VALID_OPS, pa.string()))
    key_null = None
    for k in spec.key_columns:
        if k in batch.column_names:
            n = pc.is_null(batch[k])
            key_null = n if key_null is None else pc.or_(key_null, n)
    bad_op = pc.invert(op_ok).to_numpy(zero_copy_only=False)
    if key_null is None and not bad_op.any():
        return None
    null_key = (
        np.zeros(len(batch), bool)
        if key_null is None
        else (key_null.to_numpy(zero_copy_only=False) & ~bad_op)
    )
    reason = np.where(bad_op, "bad_op", np.where(null_key, "null_key", None))
    return pa.array(reason, pa.string())


class _NormalizeBase:
    def __init__(self, plan: EvolutionPlan, num_partitions: int, salt_buckets: int = 0):
        self.plan = plan
        self.num_partitions = num_partitions
        self.salt_buckets = salt_buckets
        self.payload_schema = plan.schema_at()
        self.keys = plan.keys()
        self.pcols = plan.partition_columns()
        self.out_names = [*self.payload_schema.names, "lsn", "op"]

    def _partition_ids(self, batch: pa.Table) -> np.ndarray:
        return partition_ids_for(batch, self.pcols, self.num_partitions)

    def _finalize(self, batch: pa.Table, pids: np.ndarray) -> pa.Table:
        """Project to the epoch's logical payload schema (+ engine columns),
        cast to logical types, attach shuffle keys."""
        batch = batch.select(self.out_names)
        for f in self.payload_schema:
            if not batch.schema.field(f.name).type.equals(f.type):
                idx = batch.schema.get_field_index(f.name)
                batch = batch.set_column(idx, f.name, batch[f.name].cast(f.type, safe=True))
        batch = batch.append_column("partition_id", pa.array(pids, pa.int32()))
        if self.salt_buckets:
            batch = batch.append_column(
                "salt", _salt_column(batch, self.keys, self.salt_buckets)
            )
        return batch

    def empty_batch(self) -> pa.Table:
        fields = list(self.payload_schema) + [
            pa.field("lsn", pa.int64()),
            pa.field("op", pa.string()),
            pa.field("partition_id", pa.int32()),
        ]
        if self.salt_buckets:
            fields.append(pa.field("salt", pa.int32()))
        return pa.schema(fields).empty_table()


def expand_key_changes(batch: pa.Table, keys: list[str]) -> pa.Table:
    """Key-changing updates -> synthetic tombstone at the old key + the
    original upsert at the new key (same LSN; distinct keys, so replay dedup
    is unaffected).  ``before_<key>`` columns are non-null ONLY on key-moving
    updates; tables without before images skip this entirely."""
    before_cols = [f"before_{k}" for k in keys]
    if not all(c in batch.column_names for c in before_cols):
        return batch
    moved_mask = pc.and_(
        pc.equal(batch["op"], "U"), pc.is_valid(batch[before_cols[0]])
    )
    # a before-image equal to the after key is NOT a key change (an ordinary
    # update carrying its before row); expanding it would emit a tombstone at
    # the same (key, lsn) as the upsert and replay dedup could keep either
    differs = None
    for k in keys:
        d = pc.not_equal(batch[f"before_{k}"].cast(batch.schema.field(k).type), batch[k])
        differs = d if differs is None else pc.or_kleene(differs, d)
    moved_mask = pc.and_kleene(moved_mask, pc.fill_null(differs, False))
    if not pc.any(moved_mask).as_py():
        return batch
    moved_mask = pc.fill_null(moved_mask, False)
    moved = batch.filter(moved_mask)
    n = len(moved)
    arrays = []
    for name in batch.column_names:
        if name in keys:
            arrays.append(moved[f"before_{name}"].cast(batch.schema.field(name).type))
        elif name == "lsn":
            arrays.append(moved["lsn"])
        elif name == "op":
            arrays.append(pa.array(np.full(n, "D", dtype=object), pa.string()))
        elif name == "schema_ver":
            arrays.append(moved["schema_ver"])
        else:
            arrays.append(pa.nulls(n, batch.schema.field(name).type))
    tombs = pa.Table.from_arrays(arrays, schema=batch.schema)
    return pa.concat_tables([batch, tombs])


class NormalizeEvents(_NormalizeBase):
    """``map_batches`` UDF: event-log batch -> merge-ready batch."""

    def __init__(
        self,
        plan: EvolutionPlan,
        num_partitions: int,
        watermarks: "ray.ObjectRef | np.ndarray | None" = None,
        prereduce: bool = True,
        salt_buckets: int = 0,
        drop_origin: str | None = None,
        drop_malformed: bool = False,
    ):
        super().__init__(plan, num_partitions, salt_buckets)
        self.prereduce = prereduce
        # dead-letter routing (the reference skips/collects unprocessable
        # records instead of failing the batch, WriteListResult error map /
        # skip-on-error policy): malformed rows — unknown op codes, DML with
        # a NULL explicit key — are dropped here; the DLQ view that counts
        # them by reason is `malformed_reason_mask` (same classifier)
        self.drop_malformed = drop_malformed
        # double-active loop prevention (MysqlReader.java:576-590,
        # NormalRecordWriter.java:81-86): drop events whose txn_origin tag
        # names this engine's replication marker — they were applied locally
        # FROM the peer and must not echo back
        self.drop_origin = drop_origin
        self._watermarks = watermarks  # ObjectRef (broadcast) or ndarray or None

    @property
    def watermarks(self) -> np.ndarray | None:
        # resolve the ray.put broadcast lazily ON THE WORKER (zero-copy from
        # the local object store), not at driver-side construction
        if isinstance(self._watermarks, ray.ObjectRef):
            self._watermarks = ray.get(self._watermarks)
        return self._watermarks

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch["op"], "DDL"))
        if self.drop_malformed and len(batch):
            reasons = malformed_reasons(batch, self.plan.spec)
            if reasons is not None:
                batch = batch.filter(pc.is_null(reasons))
        if self.drop_origin is not None and "txn_origin" in batch.column_names:
            col = batch["txn_origin"]
            batch = batch.filter(
                pc.or_kleene(pc.is_null(col), pc.not_equal(col, self.drop_origin))
            )
        if len(batch) == 0:
            return self.empty_batch()
        batch = expand_key_changes(batch, self.keys)
        batch = self.plan.rewrite_to_latest(batch)

        pids = self._partition_ids(batch)
        lsn = batch["lsn"].to_numpy()

        if self.watermarks is not None:
            keep = lsn > self.watermarks[pids]
            if not keep.all():
                idx = np.nonzero(keep)[0]
                batch = batch.take(idx)
                pids, lsn = pids[idx], lsn[idx]
            if len(batch) == 0:
                return self.empty_batch()

        if self.prereduce:
            key_cols = {
                k: batch[k].to_numpy(zero_copy_only=False) for k in self.keys
            }
            keep_idx = prereduce_indices(key_cols, lsn)
            if len(keep_idx) < len(batch):
                batch = batch.take(keep_idx)
                pids = pids[keep_idx]

        return self._finalize(batch, pids)


class BaseSnapshotToEvents(_NormalizeBase):
    """``map_batches`` UDF: base lake snapshot (schema v1) -> synthetic LSN-0
    insert events under the plan's current schema, so snapshot + CDC phases
    unify into one merge (the reference runs them as two phases over the
    same table, survey §1.4).

    Watermark-aware: a partition that has ever committed (applied_lsn >= 0)
    already absorbed the snapshot, so its base rows are dropped — otherwise a
    re-supplied snapshot would resurrect keys whose tombstones were applied
    and compacted away in an earlier epoch.

    ``base_version`` is the schema version the snapshot was WRITTEN under
    (default 1 = the pristine source table).  A mid-log snapshot — the
    full-sync phase of a snapshot→CDC switchover — is already at the version
    in effect at its snapshot LSN; its batches are structurally migrated
    forward (``EvolutionPlan.migrate_table``) instead of riding the
    per-row v1 rewrite."""

    def __init__(
        self,
        plan: EvolutionPlan,
        num_partitions: int,
        salt_buckets: int = 0,
        watermarks: "ray.ObjectRef | np.ndarray | None" = None,
        base_version: int = 1,
    ):
        super().__init__(plan, num_partitions, salt_buckets)
        self._watermarks = watermarks
        self.base_version = base_version

    @property
    def watermarks(self) -> np.ndarray | None:
        if isinstance(self._watermarks, ray.ObjectRef):
            self._watermarks = ray.get(self._watermarks)
        return self._watermarks

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.base_version != 1:
            # mid-log snapshot: structurally migrate to the plan's latest
            # schema first (rename/widen/add/drop applied wholesale — every
            # row shares base_version, no per-row dispatch needed)
            batch = self.plan.migrate_table(batch, self.base_version)
        if self.watermarks is not None:
            pids0 = self._partition_ids(batch)
            keep = self.watermarks[pids0] < 0
            if not keep.all():
                batch = batch.take(np.nonzero(keep)[0])
            if len(batch) == 0:
                return self.empty_batch()
        n = len(batch)
        if self.base_version != 1:
            batch = batch.append_column("lsn", pa.array(np.zeros(n, np.int64)))
            batch = batch.append_column(
                "op", pa.array(np.full(n, "I", dtype=object), pa.string())
            )
            return self._finalize(batch, self._partition_ids(batch))
        batch = batch.append_column("schema_ver", pa.array(np.full(n, 1, np.int32)))
        batch = batch.append_column("lsn", pa.array(np.zeros(n, np.int64)))
        batch = batch.append_column("op", pa.array(np.full(n, "I", dtype=object), pa.string()))
        # ensure the physical columns the plan's rewrite reads exist
        for ch in self.plan.changes:
            if ch.kind == "add_field":
                name, t = ch.payload["name"], pa.type_for_alias(ch.payload["type"])
                if name not in batch.column_names:
                    batch = batch.append_column(name, pa.nulls(n, t))
            elif ch.kind == "rename_field":
                dst = ch.payload["to"]
                if dst not in batch.column_names:
                    src_type = batch.schema.field(ch.payload["from"]).type
                    batch = batch.append_column(dst, pa.nulls(n, src_type))
        batch = self.plan.rewrite_to_latest(batch)
        pids = self._partition_ids(batch)
        return self._finalize(batch, pids)
