"""Advance-filter query algebra.

A 1:1 rebuild of the reference's ``TapAdvanceFilter`` surface (survey §2.5;
assembled into SQL at ``connectors-common/sql-core/.../CommonSqlMaker.java``):
conjunctive equality **match**, range **operators** (GT/GTE/LT/LTE,
``CommonSqlMaker.java:220-240``), include-list **projection**
(``:150-170``), multi-key **sort** (``:242-245``), **limit/skip**
(``:251-256``) — applied to a ``ray.data.Dataset`` as vectorized Arrow
predicates inside ``map_batches`` (never per-row Python), ``select_columns``,
``Dataset.sort`` and ``split_at_indices``/``limit``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_OPS = {
    "gt": pc.greater,
    "gte": pc.greater_equal,
    "lt": pc.less,
    "lte": pc.less_equal,
}


@dataclass(frozen=True)
class QueryOperator:
    field: str
    op: str  # gt | gte | lt | lte  (QueryOperator codes 1-4 in the reference)
    value: Any


@dataclass(frozen=True)
class SortOn:
    field: str
    descending: bool = False


@dataclass
class AdvanceFilter:
    match: dict[str, Any] = field(default_factory=dict)
    operators: list[QueryOperator] = field(default_factory=list)
    projection: list[str] | None = None  # include-list
    sort_on: list[SortOn] = field(default_factory=list)
    limit: int | None = None
    skip: int | None = None


def predicate_mask(batch: pa.Table, flt: AdvanceFilter) -> pa.ChunkedArray | pa.Array:
    mask = None
    for col, val in flt.match.items():
        cond = pc.equal(batch[col], pa.scalar(val))
        mask = cond if mask is None else pc.and_kleene(mask, cond)
    for op in flt.operators:
        cond = _OPS[op.op](batch[op.field], pa.scalar(op.value))
        mask = cond if mask is None else pc.and_kleene(mask, cond)
    return mask


def make_block_topk(sort_on: list[SortOn], k: int):
    """Per-block top-k pre-reduce under the query's sort order: any row in
    the GLOBAL top-k is in its block's top-k under the same comparator, so
    the global sort afterwards only sees k rows per block instead of the
    whole filtered stream.  Rows tied with the k-th row on every sort key
    are kept (a tied row could still win the global tie-break)."""
    keys = [s.field for s in sort_on]
    order = [(s.field, "descending" if s.descending else "ascending") for s in sort_on]

    def block_topk(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        batch = batch.sort_by(order)
        kth = {key: batch[key][k - 1] for key in keys}
        tail_mask = None
        for key in keys:
            cond = pc.equal(batch[key], kth[key])
            tail_mask = cond if tail_mask is None else pc.and_kleene(tail_mask, cond)
        n_tied_after = pc.sum(pc.if_else(tail_mask, 1, 0).slice(k)).as_py() or 0
        return batch.slice(0, k + n_tied_after)

    return block_topk


def apply_advance_filter(ds: ray.data.Dataset, flt: AdvanceFilter) -> ray.data.Dataset:
    """Lazy pipeline: vectorized predicate -> projection -> per-block
    top-(skip+limit) pre-reduce -> sort -> skip/limit.  The pre-reduce means
    a ``sort+limit 100`` over a 100 TB table shuffles k rows per block, not
    the table."""
    if flt.match or flt.operators:

        def filter_batch(batch: pa.Table) -> pa.Table:
            mask = predicate_mask(batch, flt)
            return batch.filter(mask)

        ds = ds.map_batches(filter_batch, batch_format="pyarrow", zero_copy_batch=True)
    if flt.projection:
        ds = ds.select_columns(flt.projection)
    if flt.sort_on:
        if flt.limit is not None:
            k = (flt.skip or 0) + flt.limit
            ds = ds.map_batches(
                make_block_topk(flt.sort_on, k),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        ds = ds.sort(
            [s.field for s in flt.sort_on],
            descending=[s.descending for s in flt.sort_on],
        )
    if flt.skip:
        # offset over the sorted stream — the row_number() paging window the
        # reference builds for Oracle-family targets (CommonSqlMaker.java:262-290)
        _, ds = ds.split_at_indices([flt.skip])
    if flt.limit is not None:
        ds = ds.limit(flt.limit)
    return ds


def query_by_filter(ds: ray.data.Dataset, match: dict[str, Any]) -> dict | None:
    """Single-row exact-match lookup (``queryByFilter``,
    ``CommonDbConnector.java:377-398``)."""
    rows = apply_advance_filter(ds, AdvanceFilter(match=match, limit=1)).take(1)
    return rows[0] if rows else None
