"""Normalize stage: schema rewrite + key hashing + within-batch pre-reduce.

The stateless front of the replay pipeline (survey §7.2).  Per Arrow batch
(zero-copy from the object store):

1. drop DDL rows (they were folded into the EvolutionPlan by a pruned scan);
2. rewrite mixed-version rows to the latest schema (vectorized, registry.py);
3. filter rows at-or-below the per-partition applied-LSN watermark (the
   idempotent-resume path — the dedup-ledger half the reference delegates to
   its engine, survey §2.7);
4. **pre-reduce**: keep only the max-LSN row per key within the batch — the
   combiner that shrinks hot-key traffic before the one shuffle (north-rule
   skew defense; analogous to the reference's within-batch same-op run
   batching, ``NormalRecordWriter.java:87-118``);
5. attach ``partition_id = stable_hash(conv_id) % P`` — the shuffle key.

Implemented as a callable class for ``map_batches``: plan/watermarks are
deserialized once per worker, not once per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from tapdata_connectors_ray.functions.hashing import partition_ids, stable_hash_strings
from tapdata_connectors_ray.schema import LATEST_COLUMNS
from tapdata_connectors_ray.state.registry import EvolutionPlan

# columns flowing from normalize into the merge shuffle
MERGE_INPUT_COLUMNS = [*LATEST_COLUMNS, "lsn", "op", "partition_id"]


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


class NormalizeEvents:
    """``map_batches`` callable: event-log batch -> merge-ready batch."""

    def __init__(
        self,
        plan: EvolutionPlan,
        num_partitions: int,
        watermarks: "ray.ObjectRef | np.ndarray | None" = None,
        prereduce: bool = True,
        salt_buckets: int = 0,
    ):
        self.plan = plan
        self.num_partitions = num_partitions
        self.prereduce = prereduce
        self.salt_buckets = salt_buckets
        if watermarks is not None and isinstance(watermarks, ray.ObjectRef):
            watermarks = ray.get(watermarks)  # broadcast: fetched once per worker
        self.watermarks = watermarks  # np.int64[num_partitions] of applied LSNs

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch["op"], "DDL"))
        if len(batch) == 0:
            return _empty_merge_batch(self.salt_buckets)
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
                return _empty_merge_batch(self.salt_buckets)

        if self.prereduce:
            turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
            keep_idx = prereduce_indices(conv, turn, lsn)
            if len(keep_idx) < len(batch):
                batch = batch.take(keep_idx)
                pids = pids[keep_idx]

        batch = batch.select([c for c in MERGE_INPUT_COLUMNS if c in batch.column_names])
        batch = batch.append_column("partition_id", pa.array(pids, pa.int32()))
        if self.salt_buckets:
            batch = batch.append_column("salt", _salt_column(batch, self.salt_buckets))
        return batch


class BaseSnapshotToEvents:
    """``map_batches`` callable: base lake snapshot (schema v1) -> synthetic
    LSN-0 insert events in the latest schema, so snapshot + CDC phases unify
    into one merge (the reference runs them as two phases over the same
    table, survey §1.4)."""

    def __init__(self, plan: EvolutionPlan, num_partitions: int, salt_buckets: int = 0):
        self.plan = plan
        self.num_partitions = num_partitions
        self.salt_buckets = salt_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        # base schema v1 -> latest: rename tool -> tool_name, add tool_meta,
        # widen turn_score.  Reuse the plan by stamping schema_ver = base.
        batch = batch.append_column("schema_ver", pa.array(np.full(n, 1, np.int32)))
        batch = batch.append_column("lsn", pa.array(np.zeros(n, np.int64)))
        batch = batch.append_column("op", pa.array(np.full(n, "I", dtype=object), pa.string()))
        # physical superset columns the plan expects
        if "tool_name" not in batch.column_names:
            batch = batch.append_column("tool_name", pa.nulls(n, pa.string()))
        if "tool_meta" not in batch.column_names:
            batch = batch.append_column("tool_meta", pa.nulls(n, pa.string()))
        batch = batch.set_column(
            batch.schema.get_field_index("turn_score"),
            "turn_score",
            batch["turn_score"].cast(pa.int64()),
        )
        batch = self.plan.rewrite_to_latest(batch)
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        pids = partition_ids(conv, self.num_partitions)
        batch = batch.select([c for c in MERGE_INPUT_COLUMNS if c in batch.column_names])
        batch = batch.append_column("partition_id", pa.array(pids, pa.int32()))
        if self.salt_buckets:
            batch = batch.append_column("salt", _salt_column(batch, self.salt_buckets))
        return batch


def _salt_column(batch: pa.Table, salt_buckets: int) -> pa.Array:
    """Sub-bucket *within* a partition, keyed per (conv_id, turn_idx) so the
    salted pre-merge still fully collapses each key (north-rule skew salt:
    spread a hot conversation's turns across workers, then combine)."""
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    with np.errstate(over="ignore"):
        h = (stable_hash_strings(conv) >> np.uint64(17)) + turn.astype(np.uint64)
    return pa.array((h % np.uint64(salt_buckets)).astype(np.int32), pa.int32())


def _empty_merge_batch(salt_buckets: int) -> pa.Table:
    from tapdata_connectors_ray.schema import LATEST_TRANSCRIPTS_SCHEMA

    fields = list(LATEST_TRANSCRIPTS_SCHEMA) + [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("partition_id", pa.int32()),
    ]
    if salt_buckets:
        fields.append(pa.field("salt", pa.int32()))
    return pa.schema(fields).empty_table()
