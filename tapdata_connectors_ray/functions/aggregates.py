"""Consistency aggregates (survey §2.4): count, filtered count, min/max,
whole-table hash checksum, table stats.

The reference's aggregation surface is exactly these — they drive partition
planning (`min/max`, ``MysqlConnector.java:279-315``), progress accounting
(``batchCount``, ``CommonDbConnector.java:364-374``) and cross-store
consistency verification (the md5 row-hash sum, ``MysqlConnector.buildHashSql``
``:782-827``).  All are distributed: per-batch partials inside
``map_batches`` then a tiny global reduce — no full-table shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from tapdata_connectors_ray.functions.hashing import md5_number_lower
from tapdata_connectors_ray.functions.query import AdvanceFilter, predicate_mask

HASH_MOD = 1_000_000_007  # per-row modulus keeps the global sum inside int64
NULL_SENTINEL = "∅"  # matches COALESCE(CAST(col AS VARCHAR), '∅') in SQL


def batch_count(ds: ray.data.Dataset) -> int:
    """``batchCount`` — Ray Data counts from metadata when possible."""
    return ds.count()


def count_by_filter(ds: ray.data.Dataset, flt: AdvanceFilter) -> int:
    """``countByAdvanceFilter`` — vectorized predicate, metadata-free count."""

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(predicate_mask(batch, flt))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True).count()


def min_max(ds: ray.data.Dataset, column: str) -> tuple:
    from ray.data.aggregate import Max, Min

    row = ds.aggregate(Min(column, alias_name="mn"), Max(column, alias_name="mx"))
    return row["mn"], row["mx"]


def _canonical_column(col: pa.ChunkedArray) -> pa.ChunkedArray | pa.Array:
    """One column -> VARCHAR with the null sentinel, matching DuckDB's
    ``coalesce(cast(c as varchar), '∅')``.  Int/string columns cast inside
    Arrow (zero Python per cell); float columns go through pandas
    ``astype(str)`` (numpy's shortest-roundtrip repr == DuckDB's double
    printing — an Arrow float->string cast is NOT guaranteed to agree);
    anything else falls back to per-cell ``str``."""
    import pyarrow.compute as pc

    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pc.fill_null(col, NULL_SENTINEL)
    if pa.types.is_integer(t):
        return pc.fill_null(col.cast(pa.string()), NULL_SENTINEL)
    s = col.to_pandas()
    mask = s.isna()
    out = s.astype(str) if t and pa.types.is_floating(t) else s.map(str)
    if mask.any():
        out = out.where(~mask, NULL_SENTINEL)
    return pa.array(out, type=pa.string())


def canonical_row_strings(batch: pa.Table, columns: list[str]) -> list[str]:
    """'|'-joined stringification matching the oracle SQL's
    ``concat_ws('|', coalesce(cast(c as varchar), '∅'), ...)`` — DuckDB and
    Python both print shortest-roundtrip doubles, so the strings agree.
    Vectorized end-to-end: Arrow casts + one ``binary_join_element_wise``."""
    import pyarrow.compute as pc

    parts = [_canonical_column(batch[c]) for c in columns]
    if len(parts) == 1:
        joined = parts[0]
    else:
        joined = pc.binary_join_element_wise(*parts, "|")
    return joined.to_pylist()


def table_hash(ds: ray.data.Dataset, columns: list[str]) -> int:
    """Order-insensitive table checksum: sum over rows of
    ``md5_number_lower(canonical_row) % HASH_MOD``.  A checksum operator —
    md5 is inherently per-row; it runs as batch partials, not a hot-path
    transform (same role as the server-side md5 SQL in the reference)."""

    def partial(batch: pa.Table) -> pa.Table:
        strs = canonical_row_strings(batch, columns)
        h = md5_number_lower(strs) % np.uint64(HASH_MOD)
        return pa.table({"partial": [int(h.sum(dtype=np.uint64))]})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    total = parts.sum("partial")
    return int(total)


def table_summary(ds: ray.data.Dataset, columns: list[str]) -> tuple[int, int]:
    """(row count, order-insensitive state checksum) in ONE pass — the
    per-table consistency summary a multi-table sync task reports after a
    consistent cut.  Same canonicalization / md5 parity as
    :func:`table_hash`; the two reduces ride one tiny partials dataset."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        strs = canonical_row_strings(batch, columns)
        h = md5_number_lower(strs) % np.uint64(HASH_MOD)
        return pa.table(
            {"rows": [len(batch)], "partial": [int(h.sum(dtype=np.uint64))]}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    row = parts.aggregate(
        Sum("rows", alias_name="rows"), Sum("partial", alias_name="h")
    )
    return int(row["rows"] or 0), int(row["h"] or 0)


def table_stats(path: str | list[str]) -> dict:
    """Rows + storage bytes from Parquet metadata only (no data read) —
    the catalog-stats analogue (``MysqlConnector.java:774-780``)."""
    import pyarrow.dataset as pads

    ds = pads.dataset(path, format="parquet")
    rows = 0
    byte_size = 0
    for frag in ds.get_fragments():
        md = frag.metadata
        rows += md.num_rows
        for i in range(md.num_row_groups):
            byte_size += md.row_group(i).total_byte_size
    return {"num_rows": rows, "storage_bytes": byte_size}
