"""Read-partition planning: pk-range probing and recursive min/max splitting.

Rebuilds the reference's two snapshot-partitioning strategies:

- **PK-cursor probe** (``batchReadV3``, ``CommonDbConnector.java:213-301``,
  probe SQL ``:47-50``): emit a boundary key at every N-th row of the
  pk-sorted table; ranges ``(from, to]`` become resumable read units.
- **Recursive min/max splitter** (``DatabaseReadPartitionSplitter.java:73-273``,
  defaults ``:56-59``: 500k rows/partition target, re-split any range counted
  at > 4x target): numeric range bisection driven by COUNT(range), the skew
  control that decides ``override_num_blocks``/salting upstream.

Both operate on the narrow pk column only (column-pruned read); counting is
one vectorized ``np.searchsorted`` pass per batch — candidate ranges are
counted in a single scan, not one query per range like the JDBC original.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def pk_range_boundaries(
    path: str | list[str], pk: str, every: int = 500_000
) -> pd.DataFrame:
    """Boundary keys at rows 0, every, 2*every, ... of the pk-sorted table.

    Streams the sorted, column-pruned pk over the driver (metadata-scale:
    one narrow column; boundaries are ~rows/every values)."""
    ds = ray.data.read_parquet(path, columns=[pk]).sort(pk)
    boundaries: list = []
    seen = 0
    for batch in ds.iter_batches(batch_size=64 * 1024, batch_format="pyarrow"):
        col = batch[pk].to_numpy(zero_copy_only=False)
        # global indices of this batch: [seen, seen+len)
        first = (-seen) % every
        if first < len(col):
            boundaries.extend(col[first::every].tolist())
        seen += len(col)
    return pd.DataFrame({"boundary": boundaries})


def minmax_split_partitions(
    path: str | list[str],
    pk: str,
    target_rows: int = 500_000,
    max_ratio: int = 4,
    initial_pieces: int = 100,
    max_rounds: int = 8,
) -> pd.DataFrame:
    """Numeric-pk range plan: [lo, hi) ranges each counted, overweight ranges
    (> max_ratio * target) recursively bisected.  One counting scan per round
    over the pruned pk column; all candidate ranges counted together via
    searchsorted + bincount."""
    ds = ray.data.read_parquet(path, columns=[pk])
    from ray.data.aggregate import Max, Min

    row = ds.aggregate(Min(pk, alias_name="mn"), Max(pk, alias_name="mx"))
    lo, hi = float(row["mn"]), float(row["mx"]) + 1.0

    edges = np.linspace(lo, hi, initial_pieces + 1)

    def count_ranges(edges_arr: np.ndarray) -> np.ndarray:
        bc = ray.put(edges_arr)

        def partial(batch: pa.Table) -> pa.Table:
            e = ray.get(bc)
            v = batch[pk].to_numpy(zero_copy_only=False).astype(np.float64)
            idx = np.searchsorted(e, v, side="right") - 1
            idx = np.clip(idx, 0, len(e) - 2)
            counts = np.bincount(idx, minlength=len(e) - 1)
            return pa.table({"bin": np.arange(len(e) - 1), "n": counts})

        parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        agg = parts.groupby("bin").sum("n").to_pandas()
        out = np.zeros(len(edges_arr) - 1, dtype=np.int64)
        out[agg["bin"].to_numpy()] = agg["sum(n)"].to_numpy()
        return out

    for _ in range(max_rounds):
        counts = count_ranges(edges)
        heavy = counts > max_ratio * target_rows
        if not heavy.any():
            break
        new_edges = [edges[0]]
        for i, h in enumerate(heavy):
            if h:  # bisect overweight range
                new_edges.append((edges[i] + edges[i + 1]) / 2)
            new_edges.append(edges[i + 1])
        edges = np.asarray(new_edges)

    counts = count_ranges(edges)
    keep = counts > 0
    return pd.DataFrame(
        {
            "range_lo": edges[:-1][keep],
            "range_hi": edges[1:][keep],
            "row_count": counts[keep],
        }
    )
