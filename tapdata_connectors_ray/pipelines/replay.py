"""Replay pipeline: ordered change-event log -> final lake table.

The Ray-Data translation of the reference's engine loop (survey §3.1):
snapshot ``batchRead`` + CDC ``streamRead`` -> normalize -> ONE hash shuffle
on the key -> per-partition LWW merge.  Streaming end-to-end: no stage
materializes the full dataset; the only all-to-all is the keyed groupby
(survey §7.3).

Scale notes (100 TB design):
- the DDL scan reads 3 narrow columns with predicate pushdown — metadata
  scale, not data scale;
- normalize is stateless ``map_batches`` over zero-copy Arrow with a
  within-batch pre-reduce combiner, so the shuffle moves at most one row per
  (key, block) instead of one per event;
- ``salt_buckets > 0`` inserts a salted pre-merge (groupby on
  ``(partition_id, salt)``) before the final partition merge, bounding any
  single group by live-keys/salt even under Zipfian conv_id skew;
- ``num_partitions`` is the lake's fixed logical partition count (decoupled
  from cluster size; many partitions per worker for dynamic balancing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray
import ray.data

from tapdata_connectors_ray.schema import TRANSCRIPTS_SPEC, TableSpec
from tapdata_connectors_ray.stages.merge import (
    make_lww_merge,
    make_lww_premerge,
    make_write_counters,
)
from tapdata_connectors_ray.stages.normalize import BaseSnapshotToEvents, NormalizeEvents
from tapdata_connectors_ray.state.registry import EvolutionPlan

DEFAULT_NUM_PARTITIONS = 64
# normalize batch sizing is tier-dependent: big batches cut shuffle-block
# count and driver scheduling (256k best at 36M events: 18.6 s vs 28.7 s at
# 128k on 32 CPUs), but starve parallelism on small inputs (128k best at
# 1.5M events: 1.93 s vs 2.65 s at 256k).  batch_size=None auto-sizes from
# parquet footer row counts: ~10+ normalize tasks, clamped to [64k, 256k].
DEFAULT_BATCH_SIZE = 256 * 1024
MIN_BATCH_SIZE = 64 * 1024


# above this many segments the footer probe (row counts + LSN bounds) fans
# out as capped Ray tasks — at 10^6-segment scale a serial driver loop of
# footer reads is minutes of dead time before the job starts; below it the
# driver loop skips a whole Ray-job launch of fixed overhead (same policy
# split as the DDL probe, DDL_SCAN_DRIVER_MAX_FILES)
FOOTER_PROBE_DRIVER_MAX_FILES = 1024
FOOTER_PROBE_TASKS = 32
_LAST_FOOTER_PROBE_MODE = "driver"  # test observability only


def _probe_footers(paths: list[str]) -> tuple[int, int | None, int | None]:
    """(rows, lsn_min, lsn_max) from parquet FOOTERS only — no data read."""
    import pyarrow.parquet as pq

    rows, lo, hi = 0, None, None
    for p in paths:
        md = pq.read_metadata(p)
        rows += md.num_rows
        try:
            idx = md.schema.to_arrow_schema().names.index("lsn")
        except ValueError:
            continue
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            if st is not None and st.has_min_max:
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
    return rows, lo, hi


def footer_stats(paths: list[str]) -> tuple[int, int | None, int | None]:
    """(rows, lsn_min, lsn_max) over a segment list; driver-side threaded
    below FOOTER_PROBE_DRIVER_MAX_FILES, a capped Ray fan-out above it."""
    global _LAST_FOOTER_PROBE_MODE
    if len(paths) <= FOOTER_PROBE_DRIVER_MAX_FILES:
        _LAST_FOOTER_PROBE_MODE = "driver"
        return _probe_footers(paths)
    _LAST_FOOTER_PROBE_MODE = "distributed"
    probe = ray.remote(num_cpus=0.5)(_probe_footers)
    chunks = np.array_split(np.asarray(paths, dtype=object), FOOTER_PROBE_TASKS)
    parts = ray.get([probe.remote(list(c)) for c in chunks if len(c)])
    los = [lo for _, lo, _ in parts if lo is not None]
    his = [hi for _, _, hi in parts if hi is not None]
    return (
        sum(r for r, _, _ in parts),
        min(los) if los else None,
        max(his) if his else None,
    )


def _auto_batch_size(paths: list[str]) -> int:
    try:
        rows, _, _ = footer_stats(paths)
    except Exception:  # unreadable footer (incl. inside a probe task)
        return DEFAULT_BATCH_SIZE
    return int(min(max(rows // 10, MIN_BATCH_SIZE), DEFAULT_BATCH_SIZE))


def _expand_paths(path: str | list[str]) -> list[str]:
    """Expand segment directories to file lists (pyarrow needs files when a
    list is passed, e.g. for the double-replay [log, log] case)."""
    import os

    paths = [path] if isinstance(path, str) else list(path)
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
        else:
            out.append(p)
    return out


# above this many log segments the DDL probe fans out as a Ray job (footer
# reads parallelize across the cluster); below it a driver-side threaded
# Arrow scan skips a whole Ray-job launch of fixed overhead
DDL_SCAN_DRIVER_MAX_FILES = 1024

# DDL rows are the only rows carrying a ddl_payload, and parquet row-group
# null counts are exact — so `ddl_payload IS NOT NULL` prunes every pure-DML
# row group at the footer, where `op == "DDL"` can't ("DDL" sorts inside the
# [D, U] min/max of the op column).  Measured at sf3 (577 segments, 36M
# rows): 0.09 s vs 3.1 s for the string-equality filter.
_DDL_PREDICATE = ~pads.field("ddl_payload").is_null()
_DDL_COLUMNS = ["lsn", "op", "schema_ver", "ddl_payload"]


def scan_evolution_plan_distributed(
    events_path: str | list[str], spec: TableSpec = TRANSCRIPTS_SPEC
) -> EvolutionPlan:
    """Pruned scan of DDL rows: column projection + null-count row-group
    pruning; only row groups that actually contain a DDL event are read, so
    the probe runs at footer speed.  Small logs scan on the driver (Arrow's
    threaded scanner, no Ray-job launch); past DDL_SCAN_DRIVER_MAX_FILES
    segments the same probe fans out as a capped Ray read."""
    import pyarrow as pa

    paths = _expand_paths(events_path)
    if len(paths) <= DDL_SCAN_DRIVER_MAX_FILES:
        table = pads.dataset(paths, format="parquet").to_table(
            columns=_DDL_COLUMNS, filter=_DDL_PREDICATE
        )
    else:
        ddl = ray.data.read_parquet(
            paths,
            columns=_DDL_COLUMNS,
            filter=_DDL_PREDICATE,
            override_num_blocks=min(len(paths), 32),
        )
        rows = ddl.take_all()  # DDL events are metadata-scale (a handful)
        table = (
            pa.Table.from_pylist(rows)
            if rows
            else pa.table({"lsn": [], "schema_ver": [], "ddl_payload": []})
        )
    if "op" in table.column_names:  # payload-bearing non-DDL rows, if any
        import pyarrow.compute as pc

        table = table.filter(pc.equal(table["op"], "DDL"))
    return EvolutionPlan.from_ddl_table(table, spec=spec)


def normalized_events(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    salt_buckets: int = 0,
    prereduce: bool = True,
    watermarks=None,
    base_watermarks=None,
    batch_size: int | None = None,
    max_lsn: int | None = None,
    min_lsn: int | None = None,
    base_version: int = 1,
    read_filter: "pads.Expression | None" = None,
    drop_origin: str | None = None,
    drop_malformed: bool = False,
) -> ray.data.Dataset:
    """read -> normalize(+pre-reduce) [-> union base snapshot] as one lazy Dataset.

    ``read_filter`` is an extra pushed-down predicate ANDed with the LSN
    bounds — e.g. the per-table dispatch of a multi-table interleaved log
    (``table_name == 'orders'``).

    ``max_lsn`` bounds the epoch (row-group predicate pushdown at the read) —
    the log-truncation / periodic-checkpoint path of incremental ingest.
    ``min_lsn`` is the incremental-resume cursor (inclusive): the CDC phase of
    a snapshot→CDC switchover tails from the stream offset recorded BEFORE
    the snapshot started, re-delivering the overlap — LWW by LSN absorbs the
    re-delivery idempotently.  ``base_version`` is the schema version the
    base snapshot was written under (mid-log snapshots are not v1).

    ``base_watermarks`` lets the base snapshot keep its resurrection guard
    (drop base rows of partitions that ever committed) even when event-side
    watermark filtering is off (live tail, unordered segment waves); when
    ``None`` it follows ``watermarks``.
    """
    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    paths = _expand_paths(events_path)
    if batch_size is None:
        batch_size = _auto_batch_size(paths)
    read_kwargs = {}
    lsn_pred = read_filter
    if max_lsn is not None:
        below = pads.field("lsn") <= max_lsn
        lsn_pred = below if lsn_pred is None else (lsn_pred & below)
    if min_lsn is not None:
        above = pads.field("lsn") >= min_lsn
        lsn_pred = above if lsn_pred is None else (lsn_pred & above)
    if lsn_pred is not None:
        read_kwargs["filter"] = lsn_pred
    ev = ray.data.read_parquet(paths, **read_kwargs)
    ev = ev.map_batches(
        NormalizeEvents(
            plan,
            num_partitions,
            watermarks=watermarks,
            prereduce=prereduce,
            salt_buckets=salt_buckets,
            drop_origin=drop_origin,
            drop_malformed=drop_malformed,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if base_path is not None:
        base = ray.data.read_parquet(_expand_paths(base_path)).map_batches(
            BaseSnapshotToEvents(
                plan,
                num_partitions,
                salt_buckets=salt_buckets,
                watermarks=watermarks if base_watermarks is None else base_watermarks,
                base_version=base_version,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
        ev = ev.union(base)
    return ev


def winner_rows(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    plan: EvolutionPlan,
    num_partitions: int,
    max_lsn: int | None = None,
) -> ray.data.Dataset:
    """Pass 1 of the semi-join replay: narrow winner scan -> live winners as
    normalized-schema rows (op == "W"), partitioned like the events.

    Only (key columns, lsn, op) leave storage; per-block pre-reduce shrinks
    the shuffle to keys-per-block; the coarse key-bucket groupby moves
    key-width rows.  NOTHING reaches the driver — the winner set stays a
    Dataset and joins the merge shuffle (partition-local join, bounded by
    live-keys/partition)."""
    from tapdata_connectors_ray.stages.winners import (
        WinnerScanBase,
        WinnerScanEvents,
        WinnersToEventRows,
        make_winner_reduce,
    )

    keys = plan.keys()
    read_kwargs = {}
    if max_lsn is not None:
        read_kwargs["filter"] = pads.field("lsn") <= max_lsn
    paths = _expand_paths(events_path)
    cols = [*keys, "lsn", "op"]
    # include before-image key columns when the log carries them (footer-only)
    log_schema = pads.dataset(paths[0], format="parquet").schema
    cols += [f"before_{k}" for k in keys if f"before_{k}" in log_schema.names]
    # cap block counts on the NARROW reads: Ray's sort-shuffle spawns one
    # reduce task per input block, and the winner pass is key-width data —
    # uncapped SplitBlocks turns a metadata-scale groupby into hundreds of
    # tiny reduce tasks whose scheduling dwarfs the work (sf0.1: 224 reduce
    # tasks over ~14 MB).  One block per file, capped at 2x CPUs.
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    blocks = max(1, min(len(paths), 2 * ncpu))
    narrow = ray.data.read_parquet(
        paths, columns=cols, override_num_blocks=blocks, **read_kwargs
    ).map_batches(WinnerScanEvents(plan), batch_format="pyarrow", zero_copy_batch=True)
    if base_path is not None:
        bpaths = _expand_paths(base_path)
        base = ray.data.read_parquet(
            bpaths,
            columns=keys,
            override_num_blocks=max(1, min(len(bpaths), 2 * ncpu)),
        ).map_batches(WinnerScanBase(plan), batch_format="pyarrow", zero_copy_batch=True)
        narrow = narrow.union(base)
    winners = narrow.groupby("kbucket").map_groups(
        make_winner_reduce(keys), batch_format="pandas"
    )
    return winners.map_batches(
        WinnersToEventRows(plan, num_partitions), batch_format="pyarrow"
    )


def replay_merged(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    salt_buckets: int = 0,
    prereduce: bool = True,
    watermarks=None,
    batch_size: int | None = None,
    strategy: str = "shuffle",
    drop_origin: str | None = None,
    max_lsn: int | None = None,
    min_lsn: int | None = None,
    base_version: int = 1,
    read_filter: "pads.Expression | None" = None,
    drop_malformed: bool = False,
) -> ray.data.Dataset:
    """Full replay -> merged per-partition state (latest schema + lsn +
    partition_id), sorted by key within each partition.

    ``strategy="shuffle"``: classic one-pass keyed shuffle of full rows.
    ``strategy="semijoin"``: two-pass winner scan (stages/winners.py) — a
    narrow pass finds each key's winning LSN; live winners then ride the one
    merge shuffle as rows and each partition group keeps only its winners'
    events.  No driver-side winner materialization; per-group state is
    bounded by live-keys/partition."""
    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    if strategy == "semijoin":
        if min_lsn is not None or base_version != 1 or read_filter is not None:
            raise ValueError(
                "switchover resume (min_lsn/base_version) is only supported "
                "on the shuffle strategy — the winner scan assumes a full log"
            )
        from tapdata_connectors_ray.stages.winners import make_winner_merge

        winners = winner_rows(
            events_path, base_path, plan=plan, num_partitions=num_partitions,
            max_lsn=max_lsn,
        )
        ev = normalized_events(
            events_path,
            base_path,
            plan=plan,
            num_partitions=num_partitions,
            salt_buckets=0,
            prereduce=prereduce,
            watermarks=watermarks,
            batch_size=batch_size,
            max_lsn=max_lsn,
        )
        return (
            ev.union(winners)
            .groupby("partition_id")
            .map_groups(make_winner_merge(plan), batch_format="pyarrow")
        )
    ev = normalized_events(
        events_path,
        base_path,
        plan=plan,
        num_partitions=num_partitions,
        salt_buckets=salt_buckets,
        prereduce=prereduce,
        watermarks=watermarks,
        batch_size=batch_size,
        drop_origin=drop_origin,
        max_lsn=max_lsn,
        min_lsn=min_lsn,
        base_version=base_version,
        read_filter=read_filter,
        drop_malformed=drop_malformed,
    )
    if salt_buckets:
        ev = ev.groupby(["partition_id", "salt"]).map_groups(
            make_lww_premerge(plan.keys()), batch_format="pyarrow"
        )
    merge_fn = make_lww_merge(plan.schema_at(), plan.keys())
    merged = ev.groupby("partition_id").map_groups(merge_fn, batch_format="pyarrow")
    return merged


def replay_final_state(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    **kwargs,
) -> ray.data.Dataset:
    """Final lake table in the (plan-latest) logical schema."""
    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    payload_names = plan.schema_at().names

    def merged_to_final(batch):
        return batch.select(payload_names)

    return replay_merged(events_path, base_path, plan=plan, **kwargs).map_batches(
        merged_to_final, batch_format="pyarrow", zero_copy_batch=True
    )


def _dedup_sorted_frame(t: pa.Table, keys: list[str]):
    """Shared narrow-index scaffold for the history-shaped merges: dedup
    verbatim replays by (lsn, keys) keep-first, stable-sort by (keys, lsn).
    Returns (df, take_idx) where ``take_idx`` maps sorted rows back to ``t``
    positions (payload attaches later via zero-copy-ish ``take``, the
    ``lww_keep_indices`` pattern — the wide text column never enters pandas)."""
    import pandas as pd

    cols = {k: t[k].to_numpy(zero_copy_only=False) for k in keys}
    df = pd.DataFrame(
        {**cols, "__lsn": t["lsn"].to_numpy(),
         "__op": t["op"].to_numpy(zero_copy_only=False)}
    )
    df = df.drop_duplicates(["__lsn", *keys], keep="first")
    df = df.sort_values([*keys, "__lsn"], kind="stable")
    return df, df.index.to_numpy()


def _same_next_key(df, keys: list[str]) -> np.ndarray:
    """Boolean per sorted row: does the NEXT row belong to the same key?
    (null-safe — None==None, matching the no-PK fallback's key semantics)."""
    import pandas as pd

    n = len(df)
    same = np.zeros(n, dtype=bool)
    if n > 1:
        sm = np.ones(n - 1, dtype=bool)
        for k in keys:
            v = df[k].to_numpy()
            na = pd.isna(v)
            with np.errstate(invalid="ignore"):
                eq = v[1:] == v[:-1]
            sm &= np.asarray(eq, dtype=bool) | (na[1:] & na[:-1])
        same[:-1] = sm
    return same


def scd2_history(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kwargs,
) -> ray.data.Dataset:
    """Slowly-Changing-Dimension Type 2 replay: instead of collapsing each
    key to its last writer, every distinct change event opens a VERSION row
    ``[valid_from, valid_to)`` in LSN coordinates — the audit/history sink a
    CDC user points at a warehouse dimension table (reference precedent:
    the before/after images every ``TapUpdateRecordEvent`` carries,
    ``tapdata-pdk-api/.../TapUpdateRecordEvent.java``, which exist precisely
    so targets can keep row history).

    Semantics: per key in LSN order (verbatim duplicate replays dropped —
    the exactly-once ledger applies to history sinks too), each non-delete
    event yields one row with ``valid_from = lsn`` and ``valid_to`` = the
    key's next change LSN (NULL while current); a DELETE closes the prior
    version and emits nothing.  Key-changing updates close the before-image
    key's version via the synthetic tombstone normalize already emits.

    Scale shape: identical to the flagship replay — ONE keyed shuffle, and
    the versioning is a narrow-index pass (keys + lsn + op) inside the merge
    group; the wide payload attaches via ``take``.  No pre-reduce: history
    keeps every event, so the shuffle carries the full deduped log (that is
    the operator's output size, not overhead)."""
    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    keys = plan.keys()
    payload_schema = plan.schema_at()
    payload_names = payload_schema.names
    out_schema = pa.schema(
        [*payload_schema,
         ("valid_from", pa.int64()), ("valid_to", pa.int64()),
         ("is_current", pa.int64())]
    )

    ev = normalized_events(
        events_path, base_path, plan=plan, num_partitions=num_partitions,
        prereduce=False, **kwargs,
    )

    def scd2_group(t: pa.Table) -> pa.Table:
        df, take_idx = _dedup_sorted_frame(t, keys)
        n = len(df)
        if n == 0:
            return out_schema.empty_table()
        lsn = df["__lsn"].to_numpy()
        same_next = _same_next_key(df, keys)
        # valid_to = next lsn within the key run; -1 encodes NULL (current)
        nxt = np.empty(n, dtype=np.int64)
        nxt[:-1] = lsn[1:]
        nxt[-1] = -1
        valid_to = np.where(same_next, nxt, -1)
        keep = df["__op"].to_numpy() != "D"
        out = t.select(payload_names).take(np.asarray(take_idx[keep]))
        for f in payload_schema:
            if not out.schema.field(f.name).type.equals(f.type):
                i = out.schema.get_field_index(f.name)
                out = out.set_column(i, f.name, out[f.name].cast(f.type, safe=True))
        vt = valid_to[keep]
        out = out.append_column("valid_from", pa.array(lsn[keep], pa.int64()))
        out = out.append_column("valid_to", pa.array(vt, pa.int64(), mask=vt < 0))
        out = out.append_column(
            "is_current", pa.array((vt < 0).astype(np.int64), pa.int64())
        )
        return out

    return ev.groupby("partition_id").map_groups(scd2_group, batch_format="pyarrow")


def change_data_feed(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    from_lsn: int,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kwargs,
) -> ray.data.Dataset:
    """Change-data-feed read: the row-level NET delta between the lake state
    AS OF ``from_lsn`` and the current state — one row per key whose live
    image changed, tagged ``op_cdf`` ∈ {I, U, D} (Delta CDF / Hudi
    incremental-query shape; the downstream-consumer face of the same
    timeline ``dataset_at`` exposes for time travel).

    I/U rows carry the post-image, D rows the pre-image (what a downstream
    sink needs to retract).  Keys whose intermediate churn cancels out
    (UPDATE back to the same payload, INSERT then DELETE) emit nothing —
    this is the *net* feed, the semantics a downstream MERGE wants.

    Scale shape: ONE keyed shuffle of the full log (no pre-reduce: both
    endpoint winners are needed), then a narrow-index two-winner scan per
    partition group — winner-at-``from_lsn`` via a masked ``reduceat`` over
    key runs, winner-now = run tail; payloads attach via ``take`` and the
    pre/post diff is column-wise Arrow compute, never per-row Python."""
    import pyarrow.compute as pc

    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    keys = plan.keys()
    payload_schema = plan.schema_at()
    payload_names = payload_schema.names
    out_schema = pa.schema([("op_cdf", pa.string()), *payload_schema])
    non_key = [n for n in payload_names if n not in keys]

    ev = normalized_events(
        events_path, base_path, plan=plan, num_partitions=num_partitions,
        prereduce=False, **kwargs,
    )

    def cdf_group(t: pa.Table) -> pa.Table:
        df, take_idx = _dedup_sorted_frame(t, keys)
        n = len(df)
        if n == 0:
            return out_schema.empty_table()
        lsn = df["__lsn"].to_numpy()
        op = df["__op"].to_numpy()
        same_next = _same_next_key(df, keys)
        starts = np.concatenate(([0], np.flatnonzero(~same_next[:-1]) + 1)) \
            if n > 1 else np.array([0], dtype=np.int64)
        ends = np.append(starts[1:], n) - 1  # winner-now per key run
        pos = np.arange(n, dtype=np.int64)
        cand = np.where(lsn <= from_lsn, pos, -1)
        w1 = np.maximum.reduceat(cand, starts)  # -1: key absent at from_lsn
        w2 = ends
        alive1 = (w1 >= 0) & (op[np.maximum(w1, 0)] != "D")
        alive2 = op[w2] != "D"
        ins = ~alive1 & alive2
        dele = alive1 & ~alive2
        both = alive1 & alive2
        # payload diff (IS DISTINCT FROM any non-key column), Arrow-native
        upd = np.zeros(0, dtype=np.int64)
        if both.any():
            i1 = np.asarray(take_idx[w1[both]])
            i2 = np.asarray(take_idx[w2[both]])
            diff = np.zeros(len(i1), dtype=bool)
            for name in non_key:
                a = t[name].take(i1)
                b = t[name].take(i2)
                neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(
                    zero_copy_only=False
                )
                one_null = pc.xor(pc.is_null(a), pc.is_null(b)).to_numpy(
                    zero_copy_only=False
                )
                diff |= np.asarray(neq, dtype=bool) | np.asarray(one_null, dtype=bool)
            upd = np.flatnonzero(both)[diff]

        def image(rows_sorted: np.ndarray, tag: str) -> pa.Table:
            sel = np.asarray(take_idx[rows_sorted])
            out = t.select(payload_names).take(sel)
            for f in payload_schema:
                if not out.schema.field(f.name).type.equals(f.type):
                    i = out.schema.get_field_index(f.name)
                    out = out.set_column(i, f.name, out[f.name].cast(f.type, safe=True))
            tags = pa.array(np.full(len(sel), tag, dtype=object), pa.string())
            return pa.table(
                {"op_cdf": tags, **{n: out[n] for n in payload_names}},
                schema=out_schema,
            )

        parts = [image(w2[ins], "I")]
        if len(upd):
            parts.append(image(w2[upd], "U"))
        parts.append(image(w1[dele], "D"))
        parts = [p for p in parts if p.num_rows]
        return pa.concat_tables(parts) if parts else out_schema.empty_table()

    return ev.groupby("partition_id").map_groups(cdf_group, batch_format="pyarrow")


def render_transcripts(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kwargs,
) -> ray.data.Dataset:
    """Per-conversation ordered transcript assembly over the replayed final
    state — the north rule's acceptance property ("per-turn text equality
    under stable (conv_id, turn_idx) ordering") made a first-class output:
    each live conversation becomes ONE row (conv_id, n_turns, transcript)
    with turns joined in turn_idx order as ``role: text`` lines.

    Scale shape: rendering is FUSED into the LWW merge's ``map_groups`` —
    the partition groups of the one keyed shuffle already hold every turn
    of a conversation (partition_id = hash(conv_id)), and the merge output
    is key-sorted (``make_lww_merge`` ends in ``sort_by(keys)``), so the
    text payload shuffles exactly once and assembly is a sorted-run
    segment aggregation, never a second all-to-all.  Reference analogue:
    the document-mode target assembly of Tapdata's master/sub-doc merges
    (``MergeTableProcessor``), here applied to whole conversations.

    The assembly itself is Arrow-native end to end: per-turn lines via
    ``pc.binary_join_element_wise``, conversation boundaries from the
    key-sorted run starts, and the transcript join via ``pc.binary_join``
    over a ListArray view — the wide text column never round-trips through
    pandas object strings (it IS the payload at 10^10-event scale)."""
    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    merge_fn = make_lww_merge(plan.schema_at(), plan.keys())
    ev = normalized_events(
        events_path,
        base_path,
        plan=plan,
        num_partitions=num_partitions,
        **kwargs,
    )

    def merge_then_render(t: pa.Table) -> pa.Table:
        return render_merged_table(merge_fn(t))

    return ev.groupby("partition_id").map_groups(
        merge_then_render, batch_format="pyarrow"
    )


RENDER_SCHEMA = pa.schema(
    [("conv_id", pa.string()), ("n_turns", pa.int64()), ("transcript", pa.string())]
)


def render_merged_table(merged: pa.Table) -> pa.Table:
    """Arrow-native transcript assembly over a KEY-SORTED merged state
    (conv_id asc, turn_idx asc) — the shared render kernel of the fused
    replay render and the incrementally-maintained render view."""
    import pyarrow.compute as pc

    n_rows = len(merged)
    if n_rows == 0:
        return RENDER_SCHEMA.empty_table()
    conv = merged["conv_id"].combine_chunks().cast(pa.string())
    line = pc.binary_join_element_wise(
        pc.fill_null(merged["role"].combine_chunks().cast(pa.string()), ""),
        pc.fill_null(merged["text"].combine_chunks().cast(pa.string()), ""),
        ": ",
    )
    # run starts of the key-sorted conv_id column = conversation bounds
    if n_rows == 1:
        starts = np.array([0], dtype=np.int64)
    else:
        neq = pc.not_equal(conv.slice(1), conv.slice(0, n_rows - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(
            ([0], np.flatnonzero(neq).astype(np.int64) + 1)
        )
    offsets = np.concatenate((starts, [n_rows])).astype(np.int32)
    per_conv = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), line)
    return pa.table(
        {
            "conv_id": conv.take(starts),
            "n_turns": pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
            "transcript": pc.binary_join(per_conv, "\n"),
        },
        schema=RENDER_SCHEMA,
    )


TRANSCRIPT_GATE_MIN_TURNS = 8
TRANSCRIPT_GATE_MIN_ASSISTANT = 1
TRANSCRIPT_GATE_MIN_CHARS = 256
TRANSCRIPT_GATE_MAX_CHARS = 2400


def transcript_quality_gate(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kwargs,
) -> ray.data.Dataset:
    """Conversation-level CURATION GATE over the replayed lake state — the
    transcript-training analogue of the documents table's quality gates:
    keep conversations with enough turns, at least one assistant turn, and
    a total text size inside sane bounds; emit each survivor's stats row.

    Scale shape: like ``render_transcripts``, the gate is FUSED into the
    LWW merge's ``map_groups`` — the keyed shuffle's partition groups
    already hold every turn of a conversation, the merge output is
    key-sorted, so all four per-conversation statistics are segment sums
    over the sorted run (``np.add.reduceat``), cost zero extra shuffles,
    and only gated STATS rows (5 narrow columns) ever leave the merge;
    the text payload dies inside the partition group.  All-integer output
    (exact under the driver's value hash)."""
    import pyarrow.compute as pc

    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    merge_fn = make_lww_merge(plan.schema_at(), plan.keys())
    ev = normalized_events(
        events_path,
        base_path,
        plan=plan,
        num_partitions=num_partitions,
        **kwargs,
    )

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            ("n_assistant", pa.int64()),
            ("n_tool", pa.int64()),
            ("total_chars", pa.int64()),
        ]
    )

    def merge_then_gate(t: pa.Table) -> pa.Table:
        merged = merge_fn(t)  # key-sorted: (conv_id asc, turn_idx asc)
        n_rows = len(merged)
        if n_rows == 0:
            return out_schema.empty_table()
        conv = merged["conv_id"].combine_chunks().cast(pa.string())
        if n_rows == 1:
            starts = np.array([0], dtype=np.int64)
        else:
            neq = pc.not_equal(conv.slice(1), conv.slice(0, n_rows - 1)).to_numpy(
                zero_copy_only=False
            )
            starts = np.concatenate(([0], np.flatnonzero(neq).astype(np.int64) + 1))
        n_turns = np.diff(np.concatenate((starts, [n_rows]))).astype(np.int64)
        role = pc.fill_null(merged["role"].combine_chunks().cast(pa.string()), "")
        is_asst = pc.equal(role, "assistant").to_numpy(zero_copy_only=False)
        tool_col = "tool_name" if "tool_name" in merged.column_names else "tool"
        has_tool = pc.is_valid(merged[tool_col].combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        chars = pc.utf8_length(
            pc.fill_null(merged["text"].combine_chunks().cast(pa.string()), "")
        ).to_numpy(zero_copy_only=False)
        n_assistant = np.add.reduceat(is_asst.astype(np.int64), starts)
        n_tool = np.add.reduceat(has_tool.astype(np.int64), starts)
        total_chars = np.add.reduceat(chars.astype(np.int64), starts)
        keep = (
            (n_turns >= TRANSCRIPT_GATE_MIN_TURNS)
            & (n_assistant >= TRANSCRIPT_GATE_MIN_ASSISTANT)
            & (total_chars >= TRANSCRIPT_GATE_MIN_CHARS)
            & (total_chars <= TRANSCRIPT_GATE_MAX_CHARS)
        )
        idx = np.flatnonzero(keep)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(starts[idx])),
                "n_turns": pa.array(n_turns[idx], pa.int64()),
                "n_assistant": pa.array(n_assistant[idx], pa.int64()),
                "n_tool": pa.array(n_tool[idx], pa.int64()),
                "total_chars": pa.array(total_chars[idx], pa.int64()),
            },
            schema=out_schema,
        )

    return ev.groupby("partition_id").map_groups(
        merge_then_gate, batch_format="pyarrow"
    )


def transcript_loss_mask(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kwargs,
) -> ray.data.Dataset:
    """ASSISTANT-ONLY LOSS-MASK accounting over the replayed lake state —
    the SFT-training prep step: of each conversation's rendered token
    stream, only assistant turns contribute to the loss; user/system/tool
    turns are context.  Emits per live conversation the total token count,
    the masked (loss-bearing) token count, and the masked turn count — the
    exact numbers a training-data budgeter needs to weigh a conversation.

    Scale shape: fused into the LWW merge's ``map_groups`` like the quality
    gate — token counts are a vectorized substring count over the merged
    partition group, per-conversation sums are segment ``reduceat`` over
    the key-sorted run, and only 4 narrow integer columns leave the merge.
    Token convention matches the corpus QC family: whitespace split, so
    ``n_tokens == count(' ') + 1`` per non-null text."""
    import pyarrow.compute as pc

    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    merge_fn = make_lww_merge(plan.schema_at(), plan.keys())
    ev = normalized_events(
        events_path,
        base_path,
        plan=plan,
        num_partitions=num_partitions,
        **kwargs,
    )

    def merge_then_mask(t: pa.Table) -> pa.Table:
        return loss_mask_merged_table(merge_fn(t))

    return ev.groupby("partition_id").map_groups(
        merge_then_mask, batch_format="pyarrow"
    )


LOSS_MASK_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("n_tokens_total", pa.int64()),
        ("n_tokens_masked", pa.int64()),
        ("n_turns_masked", pa.int64()),
    ]
)


def loss_mask_merged_table(merged: pa.Table) -> pa.Table:
    """Loss-mask kernel over ONE merged (key-sorted) partition table —
    shared bit-for-bit by the fused one-shot query and the incremental MV
    refresh (like ``render_merged_table``)."""
    import pyarrow.compute as pc

    n_rows = len(merged)
    if n_rows == 0:
        return LOSS_MASK_SCHEMA.empty_table()
    conv = merged["conv_id"].combine_chunks().cast(pa.string())
    if n_rows == 1:
        starts = np.array([0], dtype=np.int64)
    else:
        neq = pc.not_equal(conv.slice(1), conv.slice(0, n_rows - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(neq).astype(np.int64) + 1))
    n_turns = np.diff(np.concatenate((starts, [n_rows]))).astype(np.int64)
    text = merged["text"].combine_chunks().cast(pa.string())
    valid = pc.is_valid(text).to_numpy(zero_copy_only=False)
    # whitespace tokens = spaces + 1, but a NULL text contributes 0
    # (SQL: sum skips NULL len(string_split(NULL)))
    toks = (
        pc.count_substring(pc.fill_null(text, ""), " ").to_numpy(zero_copy_only=False)
        + 1
    ) * valid
    role = pc.fill_null(merged["role"].combine_chunks().cast(pa.string()), "")
    is_asst = pc.equal(role, "assistant").to_numpy(zero_copy_only=False)
    total = np.add.reduceat(toks.astype(np.int64), starts)
    masked = np.add.reduceat((toks * is_asst).astype(np.int64), starts)
    masked_turns = np.add.reduceat(is_asst.astype(np.int64), starts)
    return pa.table(
        {
            "conv_id": conv.take(pa.array(starts)),
            "n_turns": pa.array(n_turns, pa.int64()),
            "n_tokens_total": pa.array(total, pa.int64()),
            "n_tokens_masked": pa.array(masked, pa.int64()),
            "n_turns_masked": pa.array(masked_turns, pa.int64()),
        },
        schema=LOSS_MASK_SCHEMA,
    )


def transcript_tool_sequences(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kwargs,
) -> ray.data.Dataset:
    """TOOL-CALL SEQUENCE mining over the replayed lake state — per live
    conversation, the ordered comma-joined list of tool names invoked (the
    agent-trace analytics primitive: behavior clustering, tool-usage
    frequency, curriculum selection by tool diversity all start from this
    row shape).

    Same fusion as ``render_transcripts``/``transcript_quality_gate``: the
    LWW merge's partition groups hold whole conversations key-sorted, so
    sequences assemble from the sorted run — tool-valid rows filtered once,
    per-conversation offsets from a segment-sum of the validity mask, and
    the join is one ``pc.binary_join`` over a ListArray view.  Zero extra
    shuffles; output rows are (conv_id, n_tool_calls, tool_seq)."""
    import pyarrow.compute as pc

    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    merge_fn = make_lww_merge(plan.schema_at(), plan.keys())
    ev = normalized_events(
        events_path,
        base_path,
        plan=plan,
        num_partitions=num_partitions,
        **kwargs,
    )

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_tool_calls", pa.int64()),
            ("tool_seq", pa.string()),
        ]
    )

    def merge_then_mine(t: pa.Table) -> pa.Table:
        merged = merge_fn(t)  # key-sorted: (conv_id asc, turn_idx asc)
        n_rows = len(merged)
        if n_rows == 0:
            return out_schema.empty_table()
        conv = merged["conv_id"].combine_chunks().cast(pa.string())
        if n_rows == 1:
            starts = np.array([0], dtype=np.int64)
        else:
            neq = pc.not_equal(conv.slice(1), conv.slice(0, n_rows - 1)).to_numpy(
                zero_copy_only=False
            )
            starts = np.concatenate(([0], np.flatnonzero(neq).astype(np.int64) + 1))
        tool_col = "tool_name" if "tool_name" in merged.column_names else "tool"
        tool = merged[tool_col].combine_chunks().cast(pa.string())
        valid = pc.is_valid(tool).to_numpy(zero_copy_only=False)
        n_tool = np.add.reduceat(valid.astype(np.int64), starts)
        # ListArray over the tool-valid rows: offsets = running count of
        # valid rows at each conversation boundary
        offsets = np.concatenate(([0], np.cumsum(n_tool))).astype(np.int32)
        seq_vals = tool.filter(pa.array(valid))
        per_conv = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), seq_vals)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(starts)),
                "n_tool_calls": pa.array(n_tool, pa.int64()),
                "tool_seq": pc.binary_join(per_conv, ","),
            },
            schema=out_schema,
        )

    return ev.groupby("partition_id").map_groups(
        merge_then_mine, batch_format="pyarrow"
    )


CONV_PACK_CHARS = 512


def transcript_piece_packing(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    piece_chars: int = CONV_PACK_CHARS,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kwargs,
) -> ray.data.Dataset:
    """Conversation-bounded TRAINING-PIECE packing over the replayed lake:
    each conversation splits into pieces of ~``piece_chars`` characters at
    TURN boundaries (turns never split, pieces never cross conversations)
    — the context-window prep step for transcript training data, the
    conversation analogue of the documents table's doc-bounded chunking.

    Deterministic closed-form piece rule (no greedy scan): a turn belongs
    to piece ``cum_chars_before_it_in_conv // piece_chars``, so piece
    assignment is a prefix-sum, not a loop — the same window-sum shape as
    `stages/textqc` packing, here fused into the LWW merge.  Because the
    merge output is key-sorted, (conv, piece) runs are contiguous and the
    per-piece aggregate is another segment sum over run boundaries; zero
    extra shuffles, only piece stats rows leave the merge."""
    import pyarrow.compute as pc

    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    merge_fn = make_lww_merge(plan.schema_at(), plan.keys())
    ev = normalized_events(
        events_path,
        base_path,
        plan=plan,
        num_partitions=num_partitions,
        **kwargs,
    )

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("piece", pa.int64()),
            ("n_turns", pa.int64()),
            ("n_chars", pa.int64()),
        ]
    )

    def merge_then_pack(t: pa.Table) -> pa.Table:
        merged = merge_fn(t)  # key-sorted: (conv_id asc, turn_idx asc)
        n_rows = len(merged)
        if n_rows == 0:
            return out_schema.empty_table()
        conv = merged["conv_id"].combine_chunks().cast(pa.string())
        if n_rows == 1:
            conv_change = np.zeros(0, dtype=bool)
        else:
            conv_change = pc.not_equal(
                conv.slice(1), conv.slice(0, n_rows - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            ([0], np.flatnonzero(conv_change).astype(np.int64) + 1)
        )
        chars = (
            pc.utf8_length(
                pc.fill_null(merged["text"].combine_chunks().cast(pa.string()), "")
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # chars BEFORE each turn within its conversation: global prefix sum
        # minus the conversation's start-of-segment prefix (broadcast by run)
        cum = np.concatenate(([0], np.cumsum(chars)[:-1]))
        seg_len = np.diff(np.concatenate((starts, [n_rows])))
        before = cum - np.repeat(cum[starts], seg_len)
        piece = before // piece_chars
        # (conv, piece) runs are contiguous in the sorted order
        run_new = np.ones(n_rows, dtype=bool)
        if n_rows > 1:
            run_new[1:] = conv_change | (piece[1:] != piece[:-1])
        rstarts = np.flatnonzero(run_new).astype(np.int64)
        n_turns = np.diff(np.concatenate((rstarts, [n_rows]))).astype(np.int64)
        n_chars = np.add.reduceat(chars, rstarts)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(rstarts)),
                "piece": pa.array(piece[rstarts], pa.int64()),
                "n_turns": pa.array(n_turns, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
            },
            schema=out_schema,
        )

    return ev.groupby("partition_id").map_groups(
        merge_then_pack, batch_format="pyarrow"
    )


def transcript_piece_render(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    piece_chars: int = CONV_PACK_CHARS,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kwargs,
) -> ray.data.Dataset:
    """The packed TRAINING ROWS themselves: `transcript_piece_packing`'s
    piece assignment, but emitting each piece's rendered text (turns joined
    as ``role: text`` lines) — the actual sample a trainer consumes.  Same
    fusion (piece rule + segment aggregation inside the LWW merge, Arrow
    ``binary_join_element_wise`` + ListArray ``binary_join``; the text
    column shuffles exactly once and never round-trips pandas)."""
    import pyarrow.compute as pc

    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    merge_fn = make_lww_merge(plan.schema_at(), plan.keys())
    ev = normalized_events(
        events_path,
        base_path,
        plan=plan,
        num_partitions=num_partitions,
        **kwargs,
    )

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("piece", pa.int64()),
            ("n_turns", pa.int64()),
            ("piece_text", pa.string()),
        ]
    )

    def merge_then_render(t: pa.Table) -> pa.Table:
        merged = merge_fn(t)  # key-sorted: (conv_id asc, turn_idx asc)
        n_rows = len(merged)
        if n_rows == 0:
            return out_schema.empty_table()
        conv = merged["conv_id"].combine_chunks().cast(pa.string())
        if n_rows == 1:
            conv_change = np.zeros(0, dtype=bool)
        else:
            conv_change = pc.not_equal(
                conv.slice(1), conv.slice(0, n_rows - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            ([0], np.flatnonzero(conv_change).astype(np.int64) + 1)
        )
        text = pc.fill_null(merged["text"].combine_chunks().cast(pa.string()), "")
        chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(chars)[:-1]))
        seg_len = np.diff(np.concatenate((starts, [n_rows])))
        before = cum - np.repeat(cum[starts], seg_len)
        piece = before // piece_chars
        run_new = np.ones(n_rows, dtype=bool)
        if n_rows > 1:
            run_new[1:] = conv_change | (piece[1:] != piece[:-1])
        rstarts = np.flatnonzero(run_new).astype(np.int64)
        n_turns = np.diff(np.concatenate((rstarts, [n_rows]))).astype(np.int64)
        line = pc.binary_join_element_wise(
            pc.fill_null(merged["role"].combine_chunks().cast(pa.string()), ""),
            text,
            ": ",
        )
        offsets = np.concatenate((rstarts, [n_rows])).astype(np.int32)
        per_piece = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), line)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(rstarts)),
                "piece": pa.array(piece[rstarts], pa.int64()),
                "n_turns": pa.array(n_turns, pa.int64()),
                "piece_text": pc.binary_join(per_piece, "\n"),
            },
            schema=out_schema,
        )

    return ev.groupby("partition_id").map_groups(
        merge_then_render, batch_format="pyarrow"
    )


TOOL_TRANSITION_TOP = 20


def transcript_tool_transitions(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    plan: EvolutionPlan | None = None,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    top: int = TOOL_TRANSITION_TOP,
    **kwargs,
) -> "pd.DataFrame":
    """Corpus-wide TOOL-TRANSITION mining (agent-behavior analytics): count
    every consecutive tool pair (tool_i -> tool_{i+1}) within a
    conversation's tool-call order, across all live conversations; return
    the top-N transitions.

    The transition partials are computed INSIDE the fused LWW merge — each
    partition group holds whole conversations, so consecutive tool pairs
    come from one shifted comparison over the tool-valid rows (conversation
    boundaries masked out), and only (pair, count) partial rows leave the
    merge: at most distinct-transitions x partitions, metadata scale
    (the tool vocabulary is small by definition).  Driver fold sums
    partials and takes the top-N — no second shuffle."""
    import pandas as pd
    import pyarrow.compute as pc

    plan = plan or scan_evolution_plan_distributed(events_path, spec)
    merge_fn = make_lww_merge(plan.schema_at(), plan.keys())
    ev = normalized_events(
        events_path,
        base_path,
        plan=plan,
        num_partitions=num_partitions,
        **kwargs,
    )

    part_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("n", pa.int64())]
    )

    def merge_then_count(t: pa.Table) -> pa.Table:
        merged = merge_fn(t)  # key-sorted: (conv_id asc, turn_idx asc)
        n_rows = len(merged)
        if n_rows == 0:
            return part_schema.empty_table()
        conv = merged["conv_id"].combine_chunks().cast(pa.string())
        tool_col = "tool_name" if "tool_name" in merged.column_names else "tool"
        tool = merged[tool_col].combine_chunks().cast(pa.string())
        valid = pc.is_valid(tool).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(valid)
        if len(idx) < 2:
            return part_schema.empty_table()
        # consecutive tool calls within the SAME conversation: adjacent
        # tool-valid rows whose conv matches
        conv_np = conv.to_numpy(zero_copy_only=False)
        same_conv = conv_np[idx[1:]] == conv_np[idx[:-1]]
        src_i = idx[:-1][same_conv]
        dst_i = idx[1:][same_conv]
        if not len(src_i):
            return part_schema.empty_table()
        tool_np = tool.to_numpy(zero_copy_only=False)
        pairs = pd.DataFrame({"src": tool_np[src_i], "dst": tool_np[dst_i]})
        g = pairs.groupby(["src", "dst"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "src": pa.array(g["src"].to_numpy(dtype=object), pa.string()),
                "dst": pa.array(g["dst"].to_numpy(dtype=object), pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            },
            schema=part_schema,
        )

    parts = (
        ev.groupby("partition_id")
        .map_groups(merge_then_count, batch_format="pyarrow")
        .to_pandas()  # transitions x partitions — metadata scale
    )
    out = (
        parts.groupby(["src", "dst"], as_index=False)["n"]
        .sum()
        .sort_values(["n", "src", "dst"], ascending=[False, True, True])
        .head(top)
        .reset_index(drop=True)
    )
    return out


def replay_from_normalized(
    feed: ray.data.Dataset,
    plan: EvolutionPlan,
) -> ray.data.Dataset:
    """Apply an ALREADY-normalized change feed (e.g. consumed back from the
    MQ topic sink — the replicate-out channel's consumer side) to final
    state: drop envelope extras (``mq_op``), per-partition LWW merge,
    latest-schema projection.  The feed must carry the normalize stage's
    columns (payload + lsn + op + partition_id)."""
    payload_names = plan.schema_at().names
    keep = list(payload_names) + ["lsn", "op", "partition_id"]

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select([c for c in keep if c in batch.column_names])

    merge_fn = make_lww_merge(plan.schema_at(), plan.keys())
    merged = (
        feed.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("partition_id")
        .map_groups(merge_fn, batch_format="pyarrow")
    )
    return merged.map_batches(
        lambda b: b.select(payload_names), batch_format="pyarrow", zero_copy_batch=True
    )


def lsn_bounds(events_path: str | list[str]) -> tuple[int, int]:
    """(min, max) LSN of the log from parquet footer statistics — no data
    read; past FOOTER_PROBE_DRIVER_MAX_FILES segments the probe fans out as
    capped Ray tasks instead of a serial driver loop."""
    _, lo, hi = footer_stats(_expand_paths(events_path))
    if lo is None:
        return 0, 0
    return int(lo), int(hi)


def replay_switchover(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    snapshot_lsn: int | None = None,
    snapshot_frac: float = 0.6,
    overlap_frac: float = 0.1,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    snapshot_dir: str | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Snapshot→CDC switchover: the reference's full-sync-then-incremental
    task lifecycle (``connectors-common``'s batchRead → streamRead handoff;
    the stream offset is recorded BEFORE the snapshot starts, so the CDC
    phase re-delivers every event concurrent with the snapshot and relies on
    idempotent writes to absorb the overlap).

    Phase 1 (full sync): replay events ``lsn <= S`` over the source base
    table under the plan *as of S* and commit the result as a mid-log lake
    snapshot (written at ``version_at_lsn(S)`` — NOT v1).

    Phase 2 (incremental): tail the log from ``resume = S - overlap``
    (inclusive) over that snapshot under the FULL plan.  Overlap events are
    re-applied; LWW by LSN makes the re-delivery idempotent because for any
    key the re-delivered events are exactly that key's event suffix in
    ``(resume, S]`` — the latest of them reproduces the snapshot state it
    already created.  Key-move tombstones at absent old keys and re-delivered
    deletes degenerate to no-ops.  The snapshot's rows carry synthetic
    ``lsn = 0`` so any re-delivered event wins over them.

    The final state is byte-identical to a single full replay (the oracle is
    literally ``cdc_replay_final_state``'s SQL)."""
    full_plan = scan_evolution_plan_distributed(events_path, spec)
    lo, hi = lsn_bounds(events_path)
    if snapshot_lsn is None:
        snapshot_lsn = lo + int((hi - lo) * snapshot_frac)
    plan_s = full_plan.truncated_at(snapshot_lsn)

    snap = replay_final_state(
        events_path,
        base_path,
        plan=plan_s,
        num_partitions=num_partitions,
        max_lsn=snapshot_lsn,
        **kwargs,
    )
    if snapshot_dir is None:
        import tempfile

        snapshot_dir = tempfile.mkdtemp(prefix="tcr_switchover_snap_")
    import os

    os.makedirs(snapshot_dir, exist_ok=True)
    snap.write_parquet(snapshot_dir)
    # an all-deleted (or pre-data) snapshot writes no files — phase 2 then
    # runs base-less
    has_rows = any(e.name.endswith(".parquet") for e in os.scandir(snapshot_dir))

    resume_lsn = max(lo, snapshot_lsn - int((hi - lo) * overlap_frac))
    return replay_final_state(
        events_path,
        snapshot_dir if has_rows else None,
        plan=full_plan,
        num_partitions=num_partitions,
        min_lsn=resume_lsn,
        base_version=plan_s.latest_version if has_rows else 1,
        **kwargs,
    )


def replay_policy_final_state(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    insert_policy: str = "update_on_exists",
    update_policy: str = "insert_on_nonexists",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    batch_size: int | None = None,
) -> ray.data.Dataset:
    """Replay under an explicit write-policy pair (the reference's policy
    matrix, ``WritePolicyEnum.java:3-22``; dispatch
    ``NormalWriteRecorder.java:194-245,305-357``).

    Pre-reduce is disabled: non-default policies are order-sensitive per key
    (an ignored insert depends on what preceded it), so every effective event
    must reach the partition merge.  The default pair degenerates to LWW and
    keeps the combiner-enabled :func:`replay_final_state` as its fast path.

    Order-sensitivity justifies disabling the combiner, NOT a pandas
    round-trip of the wide columns: winners are computed on narrow
    key/lsn/op frames (``policy_keep_indices``, the ``lww_keep_indices``
    pattern) and the payload attached with Arrow ``take``.
    """
    from tapdata_connectors_ray.stages.merge import policy_keep_indices

    plan = scan_evolution_plan_distributed(events_path, spec)
    keys = plan.keys()
    payload_schema = plan.schema_at()
    payload_names = payload_schema.names
    sort_keys = [(k, "ascending") for k in keys]

    ev = normalized_events(
        events_path,
        base_path,
        plan=plan,
        num_partitions=num_partitions,
        prereduce=False,
        salt_buckets=0,
        batch_size=batch_size,
    )

    def policy_merge(t: pa.Table) -> pa.Table:
        idx = policy_keep_indices(
            t, keys, insert_policy=insert_policy, update_policy=update_policy
        )
        out = t.take(np.sort(idx)).select(payload_names)
        for f in payload_schema:
            if not out.schema.field(f.name).type.equals(f.type):
                i = out.schema.get_field_index(f.name)
                out = out.set_column(i, f.name, out[f.name].cast(f.type, safe=True))
        return out.sort_by(sort_keys)

    return ev.groupby("partition_id").map_groups(policy_merge, batch_format="pyarrow")


def replay_write_counters(
    events_path: str | list[str],
    base_path: str | list[str] | None = None,
    *,
    spec: TableSpec = TRANSCRIPTS_SPEC,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kwargs,
) -> ray.data.Dataset:
    """Per-partition write counters (WriteListResult analogue).  Pre-reduce is
    disabled: counters are defined over every effective (deduped) event.

    Counters are metadata, not payload (``NormalRecordWriter.java:120-153``):
    the groupby input is projected to key + lsn + op + partition_id before the
    shuffle, so the wide text payload never rides the all-to-all."""
    plan = kwargs.pop("plan", None) or scan_evolution_plan_distributed(events_path, spec)
    ev = normalized_events(
        events_path,
        base_path,
        plan=plan,
        num_partitions=num_partitions,
        prereduce=False,
        salt_buckets=0,
        **kwargs,
    )
    narrow = ev.select_columns([*plan.keys(), "lsn", "op", "partition_id"])
    return narrow.groupby("partition_id").map_groups(
        make_write_counters(plan.keys()), batch_format="pandas"
    )
