"""Semi-join winner shuffle: find per-key winning LSNs over NARROW columns,
then drop stale event versions inside the partition merge — with the winner
set flowing as DATASET ROWS through the same keyed shuffle as the events, so
nothing is ever materialized on the driver.

The LWW merge only needs (key, lsn, op) to decide which event version
survives, so the replay runs in two passes:

1. **winner scan** (narrow): read just (key columns, lsn, op[, before keys]),
   expand key-moving updates, pre-reduce per block, one coarse-bucket
   groupby -> per-key winning (lsn, is_del).  Shuffle volume = keys-per-block
   x key-width bytes instead of full rows.
2. **partition-local join**: live winners are re-emitted as rows of the
   normalized event schema (payload nulls, op == "W"), partitioned by the
   SAME key-hash as pass 2's events, and unioned into the one merge shuffle;
   each partition group then splits winners from events and keeps only the
   rows whose (key, lsn) is its key's winner.  Per-group state is bounded by
   live-keys/partition — the design the 100 TB tier needs (a driver-side
   ``ray.put`` broadcast of the full winner set would be live-keys x row
   bytes on every node).

All functions are TableSpec-generic: key columns come from the plan
(``NormalWriteRecorder.java:64-79`` derives them per table the same way).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tapdata_connectors_ray.functions.hashing import key_hash_columns, partition_ids_for
from tapdata_connectors_ray.state.registry import EvolutionPlan

N_KEY_BUCKETS = 1024


def winner_schema(keys: list[str], key_types: list[pa.DataType]) -> pa.Schema:
    return pa.schema(
        [pa.field(k, t) for k, t in zip(keys, key_types)]
        + [
            pa.field("kbucket", pa.int32()),
            pa.field("lsn", pa.int64()),
            pa.field("is_del", pa.bool_()),
        ]
    )


class WinnerScanEvents:
    """map_batches UDF over the narrow event-log projection: per-block
    pre-reduce to one (max-LSN) row per key, coarse-bucketed for the tiny
    winner reduce."""

    def __init__(self, plan: EvolutionPlan):
        self.keys = plan.keys()

    def _emit(self, batch: pa.Table) -> pa.Table:
        kh = key_hash_columns(batch, self.keys)
        lsn = batch["lsn"].to_numpy()
        is_del = np.asarray(pc.equal(batch["op"], "D"))
        df = pd.DataFrame({"kh": kh.view(np.int64), "lsn": lsn, "is_del": is_del})
        keep = (
            df.sort_values("lsn", kind="stable")
            .drop_duplicates("kh", keep="last")
            .index.to_numpy()
        )
        keep.sort()
        out = batch.select(self.keys).take(keep)
        kb = (kh[keep] % np.uint64(N_KEY_BUCKETS)).astype(np.int32)
        out = out.append_column("kbucket", pa.array(kb, pa.int32()))
        out = out.append_column("lsn", pa.array(lsn[keep], pa.int64()))
        out = out.append_column("is_del", pa.array(is_del[keep], pa.bool_()))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch["op"], "DDL"))
        if len(batch) == 0:
            key_types = [batch.schema.field(k).type for k in self.keys]
            return winner_schema(self.keys, key_types).empty_table()
        from tapdata_connectors_ray.stages.normalize import expand_key_changes

        batch = expand_key_changes(batch, self.keys)
        return self._emit(batch)


class WinnerScanBase:
    """Base snapshot rows are LSN-0 inserts."""

    def __init__(self, plan: EvolutionPlan):
        self.keys = plan.keys()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        batch = batch.select(self.keys)
        batch = batch.append_column("lsn", pa.array(np.zeros(n, np.int64)))
        batch = batch.append_column(
            "op", pa.array(np.full(n, "I", dtype=object), pa.string())
        )
        scan = WinnerScanEvents.__new__(WinnerScanEvents)
        scan.keys = self.keys
        return scan._emit(batch)


def make_winner_reduce(keys: list[str]):
    """One key bucket: global winner per key (all of a key's per-block
    winners land in the same bucket); dead keys dropped — only live winners
    proceed to the partition-local join."""

    def winner_reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("lsn", kind="stable").drop_duplicates(keys, keep="last")
        d = d[~d["is_del"]]
        return d[[*keys, "lsn"]]

    return winner_reduce_bucket


class WinnersToEventRows:
    """map_batches UDF: (key..., lsn) winner rows -> rows of the normalized
    event schema (payload nulls, op == 'W', same partition hash as pass 2) so
    they ride the one merge shuffle."""

    def __init__(self, plan: EvolutionPlan, num_partitions: int):
        self.plan = plan
        self.num_partitions = num_partitions
        self.keys = plan.keys()
        self.pcols = plan.partition_columns()
        self.payload_schema = plan.schema_at()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        arrays, fields = [], []
        for f in self.payload_schema:
            fields.append(f)
            if f.name in self.keys:
                arrays.append(batch[f.name].cast(f.type))
            else:
                arrays.append(pa.nulls(n, f.type))
        fields += [
            pa.field("lsn", pa.int64()),
            pa.field("op", pa.string()),
            pa.field("partition_id", pa.int32()),
        ]
        arrays.append(batch["lsn"].cast(pa.int64()))
        arrays.append(pa.array(np.full(n, "W", dtype=object), pa.string()))
        pids = partition_ids_for(batch, self.pcols, self.num_partitions)
        arrays.append(pa.array(pids, pa.int32()))
        return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def make_winner_merge(plan: EvolutionPlan):
    """Partition merge for the semijoin strategy: split winner rows from
    event rows, keep each key's winning event, emit the final partition
    slice (sorted by key, payload + engine columns)."""
    keys = plan.keys()
    payload_schema = plan.schema_at()
    out_names = [*payload_schema.names, "lsn", "op", "partition_id"]
    sort_keys = [(k, "ascending") for k in keys]

    def winner_merge_group(t: pa.Table) -> pa.Table:
        is_w = pc.equal(t["op"], "W")
        winners = t.filter(is_w)
        events = t.filter(pc.invert(is_w))
        if len(winners) == 0 or len(events) == 0:
            return t.select(out_names).slice(0, 0)
        wk = key_hash_columns(winners, keys).view(np.int64)
        wl = winners["lsn"].to_numpy()
        order = np.argsort(wk, kind="stable")
        wk, wl = wk[order], wl[order]
        ek = key_hash_columns(events, keys).view(np.int64)
        el = events["lsn"].to_numpy()
        pos = np.searchsorted(wk, ek)
        pos_c = np.minimum(pos, len(wk) - 1)
        ok = (wk[pos_c] == ek) & (wl[pos_c] == el)
        out = events.take(np.nonzero(ok)[0])
        # duplicate replays of the winning event may all match -> one per key
        narrow = pd.DataFrame({"kh": ek[ok]})
        keep = narrow.drop_duplicates("kh").index.to_numpy()
        if len(keep) < len(out):
            out = out.take(keep)
        for f in payload_schema:
            if not out.schema.field(f.name).type.equals(f.type):
                i = out.schema.get_field_index(f.name)
                out = out.set_column(i, f.name, out[f.name].cast(f.type, safe=True))
        return out.select(out_names).sort_by(sort_keys)

    return winner_merge_group
