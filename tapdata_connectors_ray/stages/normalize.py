"""Normalize stage: schema rewrite + key hashing + within-batch pre-reduce.

The stateless front of the replay pipeline (survey §7.2).  Per Arrow batch
(zero-copy from the object store):

1. drop DDL rows (they were folded into the EvolutionPlan by a pruned scan);
2. rewrite mixed-version rows to the plan's current schema (vectorized,
   registry.py) — the plan may be *truncated* to an epoch's end LSN, so the
   output schema is the lake's schema **as of that epoch**, not a
   look-ahead final schema (live-tail never sees future DDL);
3. filter rows at-or-below the per-partition applied-LSN watermark (the
   idempotent-resume path — the dedup-ledger half the reference delegates to
   its engine, survey §2.7);
4. **pre-reduce**: keep only the max-LSN row per key within the batch — the
   combiner that shrinks hot-key traffic before the one shuffle (north-rule
   skew defense; analogous to the reference's within-batch same-op run
   batching, ``NormalRecordWriter.java:87-118``);
5. attach ``partition_id = stable_hash(conv_id) % P`` — the shuffle key.

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

from tapdata_connectors_ray.functions.hashing import partition_ids, stable_hash_strings
from tapdata_connectors_ray.state.registry import EvolutionPlan


def prereduce_indices(conv_id: np.ndarray, turn_idx: np.ndarray, lsn: np.ndarray) -> np.ndarray:
    """Row indices keeping one (max-LSN) row per key, in ascending row order.

    Works on narrow key columns only so the wide ``text`` payload is never
    converted — the surviving rows are selected from the Arrow table with
    ``take``.
    """
    df = pd.DataFrame({"c": conv_id, "t": turn_idx, "l": lsn})
    df = df.sort_values("l", kind="stable")
    keep = df.drop_duplicates(["c", "t"], keep="last").index.to_numpy()
    keep.sort()
    return keep


def _salt_column(batch: pa.Table, salt_buckets: int) -> pa.Array:
    """Sub-bucket *within* a partition, keyed per (conv_id, turn_idx) so the
    salted pre-merge still fully collapses each key (north-rule skew salt:
    spread a hot conversation's turns across workers, then combine)."""
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    with np.errstate(over="ignore"):
        h = (stable_hash_strings(conv) >> np.uint64(17)) + turn.astype(np.uint64)
    return pa.array((h % np.uint64(salt_buckets)).astype(np.int32), pa.int32())


class _NormalizeBase:
    def __init__(self, plan: EvolutionPlan, num_partitions: int, salt_buckets: int = 0):
        self.plan = plan
        self.num_partitions = num_partitions
        self.salt_buckets = salt_buckets
        self.payload_schema = plan.schema_at()
        self.out_names = [*self.payload_schema.names, "lsn", "op"]

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
            batch = batch.append_column("salt", _salt_column(batch, self.salt_buckets))
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


class NormalizeEvents(_NormalizeBase):
    """``map_batches`` UDF: event-log batch -> merge-ready batch."""

    def __init__(
        self,
        plan: EvolutionPlan,
        num_partitions: int,
        watermarks: "ray.ObjectRef | np.ndarray | None" = None,
        prereduce: bool = True,
        salt_buckets: int = 0,
    ):
        super().__init__(plan, num_partitions, salt_buckets)
        self.prereduce = prereduce
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
        if len(batch) == 0:
            return self.empty_batch()
        batch = self.plan.rewrite_to_latest(batch)

        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        pids = partition_ids(conv, self.num_partitions)
        lsn = batch["lsn"].to_numpy()

        if self.watermarks is not None:
            keep = lsn > self.watermarks[pids]
            if not keep.all():
                idx = np.nonzero(keep)[0]
                batch = batch.take(idx)
                conv, pids, lsn = conv[idx], pids[idx], lsn[idx]
            if len(batch) == 0:
                return self.empty_batch()

        if self.prereduce:
            turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
            keep_idx = prereduce_indices(conv, turn, lsn)
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
    and compacted away in an earlier epoch."""

    def __init__(
        self,
        plan: EvolutionPlan,
        num_partitions: int,
        salt_buckets: int = 0,
        watermarks: "ray.ObjectRef | np.ndarray | None" = None,
    ):
        super().__init__(plan, num_partitions, salt_buckets)
        self._watermarks = watermarks

    @property
    def watermarks(self) -> np.ndarray | None:
        if isinstance(self._watermarks, ray.ObjectRef):
            self._watermarks = ray.get(self._watermarks)
        return self._watermarks

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.watermarks is not None:
            conv0 = batch["conv_id"].to_numpy(zero_copy_only=False)
            pids0 = partition_ids(conv0, self.num_partitions)
            keep = self.watermarks[pids0] < 0
            if not keep.all():
                batch = batch.take(np.nonzero(keep)[0])
            if len(batch) == 0:
                return self.empty_batch()
        n = len(batch)
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
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        pids = partition_ids(conv, self.num_partitions)
        return self._finalize(batch, pids)
