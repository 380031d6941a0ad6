"""Single-pass multi-table replay: ONE scan of a shared CDC stream serves
every table in the sync task.

The per-table predicated-read strategy (`entrypoints.q_cdc_multi_table_
consistent`) re-scans the log once per table — fine for a handful of hot
tables, wrong for the reference's common shape (one binlog, hundreds of
tables in a task).  This variant is the scale-correct form:

    one read -> per-batch split by ``table_name`` (vectorized masks, T small)
    -> each table's own normalize (schema rewrite, key hash, pre-reduce)
    -> rows widened to the UNION schema with a composite shuffle key
       ``tpid = table_index * P + partition_id``
    -> ONE all-to-all -> per-(table, partition) LWW merge + summary partial
    -> tiny per-table reduce.

Partitioning assumption (documented per survey §7.4): a (table, partition)
group holds one table's rows only — the composite key guarantees it — and
group width is bounded by live-keys/partition of that table, same as the
single-table merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data

from tapdata_connectors_ray.functions.aggregates import HASH_MOD, canonical_row_strings
from tapdata_connectors_ray.functions.hashing import md5_number_lower
from tapdata_connectors_ray.stages.normalize import BaseSnapshotToEvents, NormalizeEvents
from tapdata_connectors_ray.state.registry import EvolutionPlan


def _union_schema(plans: dict[str, EvolutionPlan]) -> pa.Schema:
    fields: list[pa.Field] = []
    seen: set[str] = set()
    for plan in plans.values():
        for f in plan.schema_at():
            if f.name not in seen:
                seen.add(f.name)
                fields.append(f)
    fields += [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("table_name", pa.string()),
        pa.field("tpid", pa.int32()),
    ]
    return pa.schema(fields)


def _widen(t: pa.Table, name: str, tindex: int, num_partitions: int, schema: pa.Schema) -> pa.Table:
    """Normalized single-table rows -> union-schema rows with the composite
    shuffle key.  Missing columns become nulls; column order fixed."""
    n = len(t)
    pid = t["partition_id"].to_numpy(zero_copy_only=False)
    tpid = (tindex * num_partitions + pid).astype(np.int32)
    t = t.append_column(
        "table_name", pa.array(np.full(n, name, object), pa.string())
    ).append_column("tpid", pa.array(tpid, pa.int32()))
    arrays = []
    for f in schema:
        if f.name in t.column_names:
            col = t[f.name]
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


class MultiTableNormalize:
    """map_batches UDF: one shared-log batch -> union-schema merge-ready rows
    for EVERY table (vectorized split by ``table_name``, then each table's
    own normalize — schema rewrite, key-move expansion, pre-reduce).

    ``parent_of`` folds a partitioned SOURCE table's children back into the
    parent TableSpec before normalize (child -> parent, the Postgres shape
    where WAL events report sub-partition relations while the task declares
    only the parent, ``PostgresCdcRunner.java:316-366``): a table's rows are
    selected by ``table_name IN {parent} ∪ children(parent)`` and replay
    into the parent's single lake."""

    def __init__(
        self,
        plans: dict[str, EvolutionPlan],
        num_partitions: int,
        parent_of: dict[str, str] | None = None,
    ):
        self.num_partitions = num_partitions
        self.order = sorted(plans)
        self.normalizers = {
            name: NormalizeEvents(plans[name], num_partitions) for name in self.order
        }
        self.schema = _union_schema(plans)
        aliases: dict[str, list[str]] = {name: [name] for name in self.order}
        for child, parent in (parent_of or {}).items():
            if parent not in aliases:
                raise ValueError(f"parent_of maps {child!r} to unknown table {parent!r}")
            aliases[parent].append(child)
        self.name_sets = {n: pa.array(v, pa.string()) for n, v in aliases.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for ti, name in enumerate(self.order):
            sub = batch.filter(
                pc.is_in(batch["table_name"], value_set=self.name_sets[name])
            )
            if len(sub) == 0:
                continue
            norm = self.normalizers[name](sub)
            if len(norm) == 0:
                continue
            outs.append(_widen(norm, name, ti, self.num_partitions, self.schema))
        if not outs:
            return self.schema.empty_table()
        return pa.concat_tables(outs)


def _hash_cols(plan: EvolutionPlan) -> list[str]:
    """Canonicalized summary columns: payload with ``ts`` as epoch µs."""
    return [n if n != "ts" else "ts_us" for n in plan.schema_at().names]


def make_group_summary(plans_json: dict[str, list], specs_json: dict[str, dict]):
    """Per-(table, partition) fold: LWW merge under the group's own table
    plan, then a (rows, checksum) partial — only two numbers leave the
    group."""

    def fold(t: pa.Table) -> pa.Table:
        from tapdata_connectors_ray.schema import TableSpec
        from tapdata_connectors_ray.stages.merge import lww_keep_indices

        name = t["table_name"][0].as_py()
        plan = EvolutionPlan.from_json(
            plans_json[name], spec=TableSpec.from_json(specs_json[name])
        )
        keys = plan.keys()
        idx = lww_keep_indices(t, keys, drop_tombstones=True)
        live = t.take(np.sort(idx)).select(plan.schema_at().names)
        if "ts" in live.column_names:
            # canonicalize ts as epoch micros (DuckDB epoch_us parity)
            i = live.schema.get_field_index("ts")
            ts_us = live["ts"].cast(pa.int64())
            live = live.remove_column(i).append_column("ts_us", ts_us)
        strs = canonical_row_strings(live, _hash_cols(plan))
        h = md5_number_lower(strs) % np.uint64(HASH_MOD)
        return pa.table(
            {
                "table_name": pa.array([name], pa.string()),
                "rows": pa.array([len(live)], pa.int64()),
                "partial": pa.array([int(h.sum(dtype=np.uint64))], pa.int64()),
            }
        )

    return fold


def multi_table_single_pass_summary(
    log_path: str,
    tables: dict[str, tuple[EvolutionPlan, str | None]],
    *,
    num_partitions: int = 32,
    cut_lsn: int | None = None,
    parent_of: dict[str, str] | None = None,
) -> pd.DataFrame:
    """One shared-log scan -> per-table (rows, state checksum) at a
    consistent cut.  ``tables``: name -> (plan, base_path|None);
    ``parent_of`` folds partitioned-source children into their parent
    (see :class:`MultiTableNormalize`)."""
    from ray.data.aggregate import Sum

    plans = {name: plan for name, (plan, _) in tables.items()}
    order = sorted(plans)
    mt = MultiTableNormalize(plans, num_partitions, parent_of=parent_of)

    read_kwargs = {}
    if cut_lsn is not None:
        read_kwargs["filter"] = pads.field("lsn") <= cut_lsn
    ev = ray.data.read_parquet(log_path, **read_kwargs).map_batches(
        mt, batch_format="pyarrow", zero_copy_batch=True
    )
    for ti, name in enumerate(order):
        plan, base_path = tables[name]
        if base_path is None:
            continue
        base = ray.data.read_parquet(base_path).map_batches(
            _BaseWiden(plan, name, ti, num_partitions, mt.schema),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ev = ev.union(base)

    plans_json = {n: p.to_json() for n, p in plans.items()}
    specs_json = {n: p.spec.to_json() for n, p in plans.items()}
    summary = (
        ev.groupby("tpid")
        .map_groups(make_group_summary(plans_json, specs_json), batch_format="pyarrow")
        .groupby("table_name")
        .aggregate(Sum("rows", alias_name="rows"), Sum("partial", alias_name="state_hash"))
        .to_pandas()
        .sort_values("table_name")
        .reset_index(drop=True)
    )
    summary["state_hash"] = summary["state_hash"].astype(np.int64)
    summary["rows"] = summary["rows"].astype(np.int64)
    return summary


class _BaseWiden:
    """Base-snapshot rows for one table -> union-schema lsn-0 inserts."""

    def __init__(self, plan, name, tindex, num_partitions, schema):
        self.inner = BaseSnapshotToEvents(plan, num_partitions)
        self.name = name
        self.tindex = tindex
        self.num_partitions = num_partitions
        self.schema = schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        norm = self.inner(batch)
        if len(norm) == 0:
            return self.schema.empty_table()
        return _widen(norm, self.name, self.tindex, self.num_partitions, self.schema)
