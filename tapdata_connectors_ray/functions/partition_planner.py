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
    path: str | list[str], pk: str, every: int = 500_000, bins: int = 4096
) -> pd.DataFrame:
    """Boundary keys at rows 0, every, 2*every, ... of the pk-sorted table —
    exact distributed order statistics, NO global sort and NO driver stream
    of the column:

    1. one distributed histogram pass over ``bins`` value ranges;
    2. the cumulative bin counts (tiny) locate, per target position, its bin
       and in-bin rank;
    3. one distributed filtered pull of ONLY the needed bins' values (~rows/
       bins values per boundary) and a local ``np.partition`` per bin.

    Driver traffic = bins + occupied-needed-bin values, not the table.
    Falls back to a sorted stream for non-numeric keys."""
    import pyarrow.compute as _pc

    ds = ray.data.read_parquet(path, columns=[pk])
    schema = ds.schema()
    pk_type = schema.base_schema.field(pk).type
    if not (pa.types.is_integer(pk_type) or pa.types.is_floating(pk_type)):
        # non-numeric pk: sorted driver stream (narrow column, rare path)
        sorted_ds = ds.sort(pk)
        boundaries: list = []
        seen = 0
        for batch in sorted_ds.iter_batches(batch_size=64 * 1024, batch_format="pyarrow"):
            col = batch[pk].to_numpy(zero_copy_only=False)
            first = (-seen) % every
            if first < len(col):
                boundaries.extend(col[first::every].tolist())
            seen += len(col)
        return pd.DataFrame({"boundary": boundaries})

    from ray.data.aggregate import Max, Min

    row = ds.aggregate(Min(pk, alias_name="mn"), Max(pk, alias_name="mx"))
    lo, hi = float(row["mn"]), float(row["mx"])
    edges = np.linspace(lo, np.nextafter(hi, np.inf), bins + 1)
    edges_ref = ray.put(edges)

    def hist_partial(batch: pa.Table) -> pa.Table:
        e = ray.get(edges_ref)
        v = batch[pk].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.clip(np.searchsorted(e, v, side="right") - 1, 0, len(e) - 2)
        counts = np.bincount(idx, minlength=len(e) - 1)
        nz = np.nonzero(counts)[0]
        return pa.table({"bin": nz.astype(np.int64), "n": counts[nz]})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .sum("n")
        .to_pandas()
    )
    counts = np.zeros(bins, dtype=np.int64)
    counts[hist["bin"].to_numpy()] = hist["sum(n)"].to_numpy()
    cum = np.concatenate([[0], np.cumsum(counts)])
    total = int(cum[-1])

    targets = np.arange(0, total, every)
    t_bins = np.searchsorted(cum, targets, side="right") - 1
    in_bin_rank = targets - cum[t_bins]
    needed = np.unique(t_bins)

    lo_e, hi_e = edges[needed], edges[needed + 1]

    def pull_needed(batch: pa.Table) -> pa.Table:
        v = batch[pk].to_numpy(zero_copy_only=False).astype(np.float64)
        mask = np.zeros(len(v), dtype=bool)
        for a, b in zip(lo_e, hi_e):
            mask |= (v >= a) & (v < b)
        return batch.filter(pa.array(mask))

    vals = (
        ds.map_batches(pull_needed, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()[pk]
        .to_numpy()
    )
    vals_f = vals.astype(np.float64)
    boundaries = []
    for b, rank in zip(t_bins, in_bin_rank):
        in_bin = vals[(vals_f >= edges[b]) & (vals_f < edges[b + 1])]
        boundaries.append(np.partition(in_bin, rank)[rank])
    out = pd.DataFrame({"boundary": boundaries})
    if pa.types.is_integer(pk_type):
        out["boundary"] = out["boundary"].astype(np.int64)
    return out


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
