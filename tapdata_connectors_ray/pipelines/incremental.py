"""Checkpointed incremental ingest: epochs of change events -> lake partitions.

The engine loop of the rebuild (survey §3.1 Ray translation), run epoch by
epoch the way the reference engine consumes offset-stamped event batches
(offset per batch, commit every ``batchSize or 5 s`` —
``MysqlReader.java:363-364``):

    for each epoch (an LSN range of the log):
        read events (columns pruned, LSN-range pushdown at the row-group
        level) -> normalize/evolve -> drop rows at-or-below the partition's
        applied-LSN watermark (idempotent resume) -> pre-reduce -> shuffle
        by partition -> per-partition merge against the current lake file ->
        write epoch-stamped partition files -> ATOMIC manifest commit.

Exactly-once: a re-run of any prefix/suffix (crash before commit, task
retry, duplicate log segments) converges to the same lake state because
(a) events at-or-below the watermark are dropped, (b) within an epoch LWW
by LSN absorbs duplicates, (c) the manifest swap is the only visible commit.

Partition files are whole-partition rewrites per touched epoch (LSM-style
full compaction at the partition grain) — bounded by live keys per
partition, not by event count, which is what makes 10^10-event replay
feasible with fixed lake partition count P (pick P so live-keys/P fits a
worker; P is decoupled from cluster size).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from tapdata_connectors_ray.schema import TRANSCRIPTS_SPEC, TableSpec
from tapdata_connectors_ray.stages.merge import lww_collapse, merged_schema
from tapdata_connectors_ray.sources.storage import atomic_put_parquet
from tapdata_connectors_ray.state.checkpoint import (
    Manifest,
    PartitionState,
    commit_manifest,
    committed_epochs,
    load_manifest,
    load_manifest_at,
    partition_dir,
)
from tapdata_connectors_ray.state.registry import EvolutionPlan

# Transient-sink retry classification (reference: retryable-exception
# collection + reconnect-before-retry, ConnectorBase.java:391-406,
# exceptionCollector.collect*): I/O errors during the partition write are
# safe to retry at the TASK level because the write is idempotent —
# deterministic final file name + write-tmp-then-atomic-rename, and the
# manifest swap (the only externally visible commit) happens after all
# partitions land.  Non-I/O errors keep failing fast.
SINK_MAX_RETRIES = 4
RETRYABLE_SINK_EXCEPTIONS: tuple[type[BaseException], ...] = (OSError,)

APPLY_RESULT_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int32()),
        pa.field("file", pa.string()),
        pa.field("rows", pa.int64()),
        pa.field("max_lsn", pa.int64()),
        pa.field("event_rows", pa.int64()),
        # source-clock watermark: max event `ts` (µs) applied this epoch —
        # the signal a lag monitor compares to wall clock (reference:
        # heartbeat/referenceTime, MysqlReader.java:514-519).  -1 = no
        # ts-bearing event (base-only partition / ts-less table).
        pa.field("watermark_ts", pa.int64()),
    ]
)


def _lake_file_to_events(
    table: pa.Table, plan: EvolutionPlan, from_version: int
) -> pd.DataFrame:
    """Lake partition file -> merge-input rows (pandas; point-lookup path).
    Compacted files predating the op column read as inserts; delta files
    carry their real ops so retained tombstones keep suppressing older
    upserts."""
    t = plan.migrate_table(table, from_version=from_version)
    df = t.to_pandas()
    if "op" not in df.columns:
        df["op"] = "I"
    return df


def _lake_file_to_table(path: str, plan: EvolutionPlan, from_version: int) -> pa.Table:
    """Arrow-native variant for the merge/compact/read hot paths — the wide
    payload stays Arrow (no pandas object-string round-trip)."""
    return plan.migrate_table(pq.read_table(path), from_version=from_version)


class MergeApplyWriter:
    """Per-group merge-and-write; returns a lineage row, not data (the
    shuffle's output stays on workers; only metadata reaches the driver).

    ``mode="rewrite"`` (full compaction per epoch): current partition files
    + epoch events -> one new partition file.
    ``mode="delta"`` (LSM minor write): only the epoch's collapsed events
    (tombstones RETAINED) land as a delta file; previous files are untouched
    and reads merge across the file stack until :meth:`CheckpointedIngest.
    compact` collapses it.

    Lake files written under an older schema version are structurally
    migrated on read (the deferred target-side ALTER TABLE,
    ``CommonDbConnector.java:445-488``)."""

    def __init__(
        self,
        lake_dir: str,
        prev: dict[int, tuple[list[str], list[int]]],  # pid -> (files, per-file versions)
        epoch: int,
        plan: EvolutionPlan,
        mode: str = "rewrite",
        fault_injector=None,
    ):
        self.lake_dir = lake_dir
        self.prev = prev
        self.epoch = epoch
        self.plan = plan
        self.mode = mode
        self.keys = plan.keys()
        self.out_schema = merged_schema(plan.schema_at())
        # test hook: called with the partition id before writing; lets a
        # conformance test raise a transient error on first attempt and
        # prove the retried task converges (idempotent file names)
        self.fault_injector = fault_injector

    def __call__(self, t: pa.Table) -> pa.Table:
        pid = int(t["partition_id"][0].as_py())
        if self.fault_injector is not None:
            self.fault_injector(pid)
        event_rows = len(t)
        from tapdata_connectors_ray.stages.merge import lww_merge_tables

        if self.mode == "delta":
            merged = lww_merge_tables(
                [t], self.out_schema, self.keys, drop_tombstones=False
            )
            name = f"delta-{self.epoch:06d}.parquet"
        else:
            prev_files, prev_vers = self.prev.get(pid, ([], []))
            tables = [t] + [
                _lake_file_to_table(f, self.plan, ver)
                for f, ver in zip(prev_files, prev_vers)
            ]
            merged = lww_merge_tables(tables, self.out_schema, self.keys)
            name = f"part-{self.epoch:06d}.parquet"

        pdir = partition_dir(self.lake_dir, pid)
        out = os.path.join(pdir, name)
        # deterministic final name: a retried task rewrites identical content;
        # the SPI's atomic put (LOCAL: tmp + rename) keeps partial files
        # invisible — swap the backend and the commit mechanics follow
        from tapdata_connectors_ray.sources.storage import atomic_put_parquet

        atomic_put_parquet(merged, out)

        import pyarrow.compute as pc

        # watermark over the epoch's INPUT events, not the merged output: a
        # dropped tombstone (rewrite mode) is still an APPLIED event — taking
        # the max from the merged rows would under-record the watermark and
        # make a later resume/resync re-deliver (idempotent but wasteful)
        max_lsn = int(pc.max(t["lsn"]).as_py()) if len(t) else -1
        # source-clock watermark over the epoch's real log events (lsn>0
        # excludes base-snapshot rows whose ts is payload, not stream clock;
        # synthetic key-move tombstones carry null ts and drop out of max)
        wm_ts = -1
        if "ts" in t.column_names:
            ev_ts = t.filter(pc.greater(t["lsn"], 0))["ts"]
            if len(ev_ts):
                # tz-safe µs: timestamp[us] -> int64 is a raw reinterpret
                m = pc.max(ev_ts.cast(pa.int64())).as_py()
                if m is not None:
                    wm_ts = int(m)
        return pa.Table.from_pydict(
            {
                "partition_id": [pid],
                "file": [out],
                "rows": [merged.num_rows],
                "max_lsn": [max_lsn],
                "event_rows": [event_rows],
                "watermark_ts": [wm_ts],
            },
            schema=APPLY_RESULT_SCHEMA,
        )


class CheckpointedIngest:
    """Driver-side coordinator owning the lake directory + manifest."""

    def __init__(
        self,
        lake_dir: str,
        num_partitions: int = 64,
        salt_buckets: int = 0,
        batch_size: int | None = None,  # None = auto from footer row counts
        spec: TableSpec = TRANSCRIPTS_SPEC,
    ):
        self.lake_dir = lake_dir
        self.salt_buckets = salt_buckets
        self.batch_size = batch_size
        existing = load_manifest(lake_dir)
        if existing is not None:
            if existing.num_partitions != num_partitions:
                raise ValueError(
                    f"lake has {existing.num_partitions} partitions, requested {num_partitions}"
                )
            self.manifest = existing
            if existing.table_spec is not None:
                # the lake's recorded spec is authoritative on resume
                spec = TableSpec.from_json(existing.table_spec)
        else:
            self.manifest = Manifest(num_partitions=num_partitions)
        self.spec = spec
        self.num_partitions = self.manifest.num_partitions

    # -- one epoch ---------------------------------------------------------

    def ingest(
        self,
        events_path: str | list[str],
        base_path: str | list[str] | None = None,
        *,
        end_lsn: int | None = None,
        commit: bool = True,
        use_watermarks: bool = True,
        mode: str = "rewrite",
        fault_injector=None,
        plan: EvolutionPlan | None = None,
        read_filter=None,
    ) -> Manifest:
        """Apply all events with ``watermark < lsn [<= end_lsn]``; optionally
        commit the manifest (``commit=False`` models a crash after data files
        land but before the atomic swap — used by the resume tests).

        ``use_watermarks=False`` is for segment-granularity delivery (live
        tail): the watermark drop is only valid under strictly LSN-ordered
        delivery; with unordered segment waves, cross-epoch correctness comes
        from the merge's LWW over the lake rows' persisted ``lsn`` instead,
        and re-delivery dedup from the file offset.

        ``plan`` / ``read_filter`` serve a shared multi-table log (one binlog,
        many tables in the task): the caller pre-scans THIS table's DDL and
        pushes a ``table_name == ...`` predicate into the read, so the lake
        never sees — or pays for — other tables' rows."""
        from tapdata_connectors_ray.pipelines.replay import (
            normalized_events,
            scan_evolution_plan_distributed,
        )
        from tapdata_connectors_ray.stages.merge import make_lww_premerge

        if plan is None:
            plan = scan_evolution_plan_distributed(events_path, self.spec)
        if self.manifest.ddl_history:
            # live tail: the wave's segments carry only their own DDL rows;
            # fold in the committed history so old-version rows still rewrite
            plan = EvolutionPlan.from_json(
                self.manifest.ddl_history, spec=self.spec
            ).merged_with(plan)
        if end_lsn is not None:
            plan = EvolutionPlan(
                changes=[c for c in plan.changes if c.lsn <= end_lsn],
                base_version=plan.base_version,
                spec=plan.spec,
            )

        wm = self.manifest.watermarks()
        wm_ref = ray.put(wm) if use_watermarks else None
        # the base snapshot's resurrection guard must stay on even when
        # event-side watermark filtering is off (live tail): a re-supplied
        # base must not revive keys whose tombstones were compacted away
        base_wm_ref = wm_ref if use_watermarks else (
            ray.put(wm) if base_path is not None else None
        )
        ev = normalized_events(
            events_path,
            base_path,
            plan=plan,
            num_partitions=self.num_partitions,
            salt_buckets=self.salt_buckets,
            prereduce=True,
            watermarks=wm_ref,
            base_watermarks=base_wm_ref,
            batch_size=self.batch_size,
            max_lsn=end_lsn,
            read_filter=read_filter,
        )
        if self.salt_buckets:
            ev = ev.groupby(["partition_id", "salt"]).map_groups(
                make_lww_premerge(plan.keys()), batch_format="pyarrow"
            )

        epoch = self.manifest.epoch + 1
        prev = {
            pid: (list(st.files), st.versions())
            for pid, st in self.manifest.partitions.items()
        }
        writer = MergeApplyWriter(
            self.lake_dir, prev, epoch, plan, mode=mode, fault_injector=fault_injector
        )

        def merge_apply(t: pa.Table) -> pa.Table:  # map_groups needs a plain fn
            return writer(t)

        results = (
            ev.groupby("partition_id")
            .map_groups(
                merge_apply,
                batch_format="pyarrow",
                max_retries=SINK_MAX_RETRIES,
                retry_exceptions=list(RETRYABLE_SINK_EXCEPTIONS),
            )
            .take_all()
        )

        new = Manifest(
            num_partitions=self.num_partitions,
            epoch=epoch,
            schema_version=plan.latest_version,
            ddl_history=plan.to_json(),
            table_spec=self.spec.to_json(),
            partitions=dict(self.manifest.partitions),
        )
        for r in results:
            pid = int(r["partition_id"])
            prev_st = self.manifest.partitions.get(pid)
            prev_wm = prev_st.applied_lsn if prev_st else -1
            if mode == "delta":
                files = (list(prev_st.files) if prev_st else []) + [r["file"]]
                fvers = (prev_st.versions() if prev_st else []) + [plan.latest_version]
            else:
                files = [r["file"]]
                fvers = [plan.latest_version]
            prev_wm_ts = int((prev_st.lineage if prev_st else {}).get("watermark_ts", -1))
            new.partitions[pid] = PartitionState(
                applied_lsn=max(prev_wm, int(r["max_lsn"])),
                files=files,
                file_versions=fvers,
                rows=int(r["rows"]),
                schema_version=plan.latest_version,
                lineage={
                    "epoch": epoch,
                    "event_rows": int(r["event_rows"]),
                    "prev_applied_lsn": prev_wm,
                    # per-partition source-clock watermark (µs), monotone
                    # across epochs — the lag-monitor signal
                    "watermark_ts": max(prev_wm_ts, int(r["watermark_ts"])),
                },
            )
        if commit:
            commit_manifest(self.lake_dir, new, expected_epoch=new.epoch - 1)
            self.manifest = new
        return new

    def ingest_audited(
        self,
        events_path: str | list[str],
        base_path: str | list[str] | None = None,
        *,
        end_lsn: int | None = None,
        checks: list | None = None,
    ) -> tuple[Manifest, dict]:
        """Write-audit-publish (the Iceberg WAP / staged-commit pattern —
        the quality gate between a CDC epoch landing and consumers seeing
        it): the epoch's partition files land on disk but the manifest is
        NOT committed; a distributed audit then validates the staged state,
        and only a fully-green audit publishes (the same CAS swap).  A red
        audit leaves the lake byte-identical for readers — the staged files
        are unreferenced orphans the next ``vacuum`` removes — and a later
        retry re-stages from the unchanged watermarks.

        Built-in invariants, audited over ONLY the partitions the epoch
        changed (manifest file-list diff — the CDF pruning rule): key
        columns null-free, and key uniqueness within each partition's merged
        state.  ``checks`` adds caller predicates ``fn(merged: pa.Table) ->
        (ok, detail)`` run per changed partition.  Returns
        ``(manifest, audit)`` where ``audit['published']`` says which way it
        went."""
        staged = self.ingest(events_path, base_path, end_lsn=end_lsn, commit=False)
        plan = EvolutionPlan.from_json(staged.ddl_history, spec=self.spec)
        keys = plan.keys()
        changed = [
            pid for pid in staged.partitions
            if list(staged.partitions[pid].files)
            != list(
                self.manifest.partitions[pid].files
                if pid in self.manifest.partitions else []
            )
        ]
        items = [
            {"pid": pid, "files": list(staged.partitions[pid].files),
             "vers": staged.partitions[pid].versions()}
            for pid in sorted(changed)
        ]
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()
        user_checks = list(checks or [])

        def audit_one(batch: pd.DataFrame) -> pa.Table:
            from tapdata_connectors_ray.stages.merge import lww_merge_tables

            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            out_schema = merged_schema(plan_l.schema_at())
            rows = []
            for _, row in batch.iterrows():
                tables = [
                    _lake_file_to_table(f, plan_l, int(v))
                    for f, v in zip(row["files"], row["vers"])
                ]
                merged = lww_merge_tables(tables, out_schema, plan_l.keys())
                key_nulls = sum(
                    merged[k].null_count for k in keys
                ) if len(merged) else 0
                kf = pd.DataFrame(
                    {k: merged[k].to_numpy(zero_copy_only=False) for k in keys}
                )
                dup_keys = int(kf.duplicated(keep="first").sum())
                failed = []
                for i, fn in enumerate(user_checks):
                    ok, detail = fn(merged)
                    if not ok:
                        failed.append(f"check[{i}]: {detail}")
                rows.append(
                    {"partition_id": int(row["pid"]), "rows": len(merged),
                     "key_nulls": int(key_nulls), "dup_keys": dup_keys,
                     "failed": "; ".join(failed)}
                )
            return pa.Table.from_pylist(rows)

        results = (
            ray.data.from_items(items)
            .map_batches(audit_one, batch_format="pandas", batch_size=1)
            .take_all()
        ) if items else []
        key_nulls = sum(int(r["key_nulls"]) for r in results)
        dup_keys = sum(int(r["dup_keys"]) for r in results)
        failures = [r["failed"] for r in results if r["failed"]]
        passed = key_nulls == 0 and dup_keys == 0 and not failures
        audit = {
            "published": passed,
            "partitions_audited": len(results),
            "key_nulls": key_nulls,
            "dup_keys": dup_keys,
            "failed_checks": failures,
            "staged_epoch": staged.epoch,
        }
        if passed:
            commit_manifest(self.lake_dir, staged, expected_epoch=staged.epoch - 1)
            self.manifest = staged
            return staged, audit
        return self.manifest, audit

    # -- multi-epoch replay ------------------------------------------------

    def ingest_in_epochs(
        self,
        events_path: str | list[str],
        base_path: str | list[str] | None = None,
        *,
        n_epochs: int = 4,
        mode: str = "rewrite",
    ) -> Manifest:
        """Split the log's LSN range into ``n_epochs`` checkpointed applies —
        the replay analogue of the reference's periodic offset commit.
        Footer-stats only (no data read), distributed past the segment-count
        threshold (``replay.footer_stats``)."""
        from tapdata_connectors_ray.pipelines.replay import lsn_bounds

        _, max_lsn = lsn_bounds(events_path)
        bounds = np.linspace(0, max_lsn, n_epochs + 1).astype(np.int64)[1:]
        m = self.manifest
        for b in bounds:
            m = self.ingest(
                events_path,
                base_path if m.epoch == 0 else None,
                end_lsn=int(b),
                mode=mode,
            )
        return m

    # -- reads -------------------------------------------------------------

    def committed_plan(self, manifest: Manifest | None = None) -> EvolutionPlan:
        """DDL history as of the given commit (default: the latest)."""
        m = manifest or self.manifest
        return EvolutionPlan.from_json(m.ddl_history, spec=self.spec)

    def _partition_items(
        self, only_stacked: bool = False, manifest: Manifest | None = None
    ) -> list[dict]:
        m = manifest or self.manifest
        return [
            {"pid": pid, "files": list(st.files), "vers": st.versions()}
            for pid, st in sorted(m.partitions.items())
            if st.files and (len(st.files) > 1 or not only_stacked)
        ]

    def final_dataset(self, manifest: Manifest | None = None) -> ray.data.Dataset:
        """The committed lake table as a streaming Dataset: ONE read-merge
        task per partition (no shuffle — partitions are key-disjoint).  A
        delta stack (multiple files with live tombstones) collapses here at
        read time; files predating a DDL are migrated per their recorded
        schema version.

        ``manifest`` selects an earlier commit (time-travel read via
        :meth:`dataset_at`)."""
        plan = self.committed_plan(manifest)
        payload_names = plan.schema_at().names
        items = self._partition_items(manifest=manifest)
        if not items:
            return ray.data.from_arrow(plan.schema_at().empty_table())
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()

        def read_merge(batch: pd.DataFrame) -> pa.Table:
            from tapdata_connectors_ray.stages.merge import lww_merge_tables

            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            keys = plan_l.keys()
            out_schema = merged_schema(plan_l.schema_at())
            outs = []
            for _, row in batch.iterrows():
                tables = [
                    _lake_file_to_table(f, plan_l, int(v))
                    for f, v in zip(row["files"], row["vers"])
                ]
                merged = lww_merge_tables(tables, out_schema, keys)
                outs.append(merged.select(payload_names))
            return pa.concat_tables(outs)

        return ray.data.from_items(items).map_batches(
            read_merge, batch_format="pandas", batch_size=1
        )

    def compact_minor(self, min_delta_files: int = 2, commit: bool = True) -> Manifest:
        """LSM *minor* compaction: collapse each partition's DELTA stack into
        ONE delta file — tombstones RETAINED (a delete must keep beating the
        base file's older upserts at read time), base/compacted files
        untouched.  Bounds read amplification (files/partition) without the
        full rewrite a major ``compact`` pays; the Hudi/LSM small-file merge
        step between commits."""
        plan = self.committed_plan()
        items = []
        for pid, st in sorted(self.manifest.partitions.items()):
            vers = st.versions()
            deltas = [
                (f, v)
                for f, v in zip(st.files, vers)
                if os.path.basename(f).startswith("delta-")
            ]
            if len(deltas) >= min_delta_files:
                items.append(
                    {
                        "pid": pid,
                        "files": [f for f, _ in deltas],
                        "vers": [v for _, v in deltas],
                    }
                )
        if not items:
            return self.manifest
        epoch = self.manifest.epoch + 1
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()
        lake_dir = self.lake_dir

        def minor_one(batch: pd.DataFrame) -> pa.Table:
            from tapdata_connectors_ray.stages.merge import lww_merge_tables

            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            keys = plan_l.keys()
            out_schema = merged_schema(plan_l.schema_at())
            rows = []
            for _, row in batch.iterrows():
                pid = int(row["pid"])
                tables = [
                    _lake_file_to_table(f, plan_l, int(v))
                    for f, v in zip(row["files"], row["vers"])
                ]
                merged = lww_merge_tables(
                    tables, out_schema, keys, drop_tombstones=False
                )
                out = os.path.join(
                    partition_dir(lake_dir, pid), f"delta-{epoch:06d}.parquet"
                )
                atomic_put_parquet(merged, out)
                rows.append({"partition_id": pid, "file": out, "rows": merged.num_rows})
            return pa.Table.from_pylist(rows)

        results = (
            ray.data.from_items(items)
            .map_batches(minor_one, batch_format="pandas", batch_size=1)
            .take_all()
        )
        new = Manifest(
            num_partitions=self.num_partitions,
            epoch=epoch,
            schema_version=plan.latest_version,
            ddl_history=plan.to_json(),
            table_spec=self.spec.to_json(),
            partitions=dict(self.manifest.partitions),
        )
        superseded: list[str] = []
        for r in results:
            pid = int(r["partition_id"])
            old = self.manifest.partitions[pid]
            vers = old.versions()
            kept = [
                (f, v)
                for f, v in zip(old.files, vers)
                if not os.path.basename(f).startswith("delta-")
            ]
            superseded.extend(
                f for f in old.files if os.path.basename(f).startswith("delta-")
            )
            new.partitions[pid] = PartitionState(
                applied_lsn=old.applied_lsn,
                files=[f for f, _ in kept] + [r["file"]],
                file_versions=[v for _, v in kept] + [plan.latest_version],
                rows=old.rows,
                schema_version=plan.latest_version,
                lineage={
                    **old.lineage,
                    "minor_compacted_epoch": epoch,
                    "minor_compacted_files": len(old.files) - len(kept),
                },
            )
        if commit:
            commit_manifest(self.lake_dir, new, expected_epoch=new.epoch - 1)
            self.manifest = new
            for f in superseded:
                try:
                    os.remove(f)
                except OSError:
                    pass
        return new

    def compact(self, commit: bool = True) -> Manifest:
        """Collapse every partition's delta stack into one compacted file
        (LSM major compaction): dedup + LWW + tombstone drop, one task per
        stacked partition; single atomic manifest swap; superseded files are
        best-effort deleted AFTER the commit (orphans are invisible anyway)."""
        plan = self.committed_plan()
        items = self._partition_items(only_stacked=True)
        if not items:
            return self.manifest
        epoch = self.manifest.epoch + 1
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()
        lake_dir = self.lake_dir

        def compact_one(batch: pd.DataFrame) -> pa.Table:
            from tapdata_connectors_ray.stages.merge import lww_merge_tables

            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            keys = plan_l.keys()
            out_schema = merged_schema(plan_l.schema_at())
            rows = []
            for _, row in batch.iterrows():
                pid = int(row["pid"])
                tables = [
                    _lake_file_to_table(f, plan_l, int(v))
                    for f, v in zip(row["files"], row["vers"])
                ]
                merged = lww_merge_tables(tables, out_schema, keys)
                out = os.path.join(partition_dir(lake_dir, pid), f"part-{epoch:06d}.parquet")
                atomic_put_parquet(merged, out)
                rows.append({"partition_id": pid, "file": out, "rows": merged.num_rows})
            return pa.Table.from_pylist(rows)

        results = (
            ray.data.from_items(items)
            .map_batches(compact_one, batch_format="pandas", batch_size=1)
            .take_all()
        )
        new = Manifest(
            num_partitions=self.num_partitions,
            epoch=epoch,
            schema_version=plan.latest_version,
            ddl_history=plan.to_json(),
            table_spec=self.spec.to_json(),
            partitions=dict(self.manifest.partitions),
        )
        superseded: list[str] = []
        for r in results:
            pid = int(r["partition_id"])
            old = self.manifest.partitions[pid]
            superseded.extend(old.files)
            new.partitions[pid] = PartitionState(
                applied_lsn=old.applied_lsn,
                files=[r["file"]],
                file_versions=[plan.latest_version],
                rows=int(r["rows"]),
                schema_version=plan.latest_version,
                lineage={**old.lineage, "compacted_epoch": epoch,
                         "compacted_files": len(old.files)},
            )
        if commit:
            commit_manifest(self.lake_dir, new, expected_epoch=new.epoch - 1)
            self.manifest = new
            for f in superseded:  # invisible after the swap; best-effort GC
                try:
                    os.remove(f)
                except OSError:
                    pass
        return new

    def merge_on_read(self, events_path: str | list[str]) -> ray.data.Dataset:
        """Read-time merged view: committed lake ∪ not-yet-compacted log
        suffix, LWW-merged per partition WITHOUT writing anything — the
        merge-on-read lake pattern (Hudi MOR; the reference's closest
        analogue is the ClickHouse ReplacingMergeTree FINAL read,
        ``ClickhouseConnector.java:265-287``).

        The pending suffix is selected by the per-partition watermark (rows
        at-or-below it are already in the lake files), so the view equals a
        full compaction's output at any checkpoint."""
        from tapdata_connectors_ray.pipelines.replay import (
            normalized_events,
            scan_evolution_plan_distributed,
        )
        from tapdata_connectors_ray.stages.merge import make_lww_merge

        plan = scan_evolution_plan_distributed(events_path, self.spec)
        if self.manifest.ddl_history:
            plan = EvolutionPlan.from_json(
                self.manifest.ddl_history, spec=self.spec
            ).merged_with(plan)
        payload_names = plan.schema_at().names
        col_order = [*payload_names, "lsn", "op", "partition_id"]

        pending = normalized_events(
            events_path,
            None,
            plan=plan,
            num_partitions=self.num_partitions,
            watermarks=ray.put(self.manifest.watermarks()),
            batch_size=self.batch_size,
        ).map_batches(
            lambda b: b.select(col_order), batch_format="pyarrow", zero_copy_batch=True
        )

        by_version: dict[int, list[str]] = {}
        for st in self.manifest.partitions.values():
            for f, v in zip(st.files, st.versions()):
                by_version.setdefault(v, []).append(f)
        view = pending
        for ver, files in sorted(by_version.items()):
            if not files:
                continue

            def lake_rows(batch: pa.Table, _ver=ver) -> pa.Table:
                t = plan.migrate_table(batch, from_version=_ver)
                if "op" not in t.column_names:  # pre-op compacted files
                    t = t.append_column(
                        "op", pa.array(np.full(len(t), "I", dtype=object), pa.string())
                    )
                return t.select(col_order)

            view = view.union(
                ray.data.read_parquet(files).map_batches(lake_rows, batch_format="pyarrow")
            )

        merge_fn = make_lww_merge(plan.schema_at(), plan.keys())
        merged = view.groupby("partition_id").map_groups(merge_fn, batch_format="pyarrow")
        return merged.map_batches(
            lambda b: b.select(payload_names), batch_format="pyarrow", zero_copy_batch=True
        )

    def lookup(self, key: dict) -> dict | None:
        """Point lookup (``queryByFilter`` analogue,
        ``CommonDbConnector.java:377-398``): prune to the owning partition's
        file via the manifest, then scan just that file.  ``key`` must cover
        the spec's partition columns (to locate the partition); any further
        key columns narrow the parquet filter."""
        from tapdata_connectors_ray.functions.hashing import partition_ids_for

        plan = self.committed_plan()
        pcols = plan.partition_columns()
        probe = pa.table({c: [key[c]] for c in pcols})
        pid = int(partition_ids_for(probe, pcols, self.num_partitions)[0])
        st = self.manifest.partitions.get(pid)
        if not st or not st.files:
            return None
        frames = []
        for f, v in zip(st.files, st.versions()):
            t = pq.read_table(f, filters=[(k, "=", val) for k, val in key.items()])
            frames.append(_lake_file_to_events(t, plan, v))
        df = lww_collapse(pd.concat(frames, ignore_index=True), keys=plan.keys())
        rows = df[plan.schema_at().names].to_dict("records")
        return rows[0] if rows else None

    def query_by_key(self, conv_id: str, turn_idx: int) -> dict | None:
        """Transcripts-keyed convenience wrapper over :meth:`lookup`."""
        return self.lookup({"conv_id": conv_id, "turn_idx": turn_idx})

    def define_mv(self, name: str, aggs: list[dict]) -> None:
        """Register a named materialized view with a declarative aggregate
        spec: ``[{"op": "count"|"sum"|"min"|"max", "col": <payload column or
        None for count>, "alias": <output name>}, ...]``.  Group columns are
        always the partition key (the property that keeps refresh
        partition-local).  The spec persists beside the view's data
        (``mv/<name>/spec.json``) so refreshes resume across runs."""
        for a in aggs:
            if a["op"] not in ("count", "sum", "min", "max"):
                raise ValueError(f"unsupported MV aggregate {a['op']!r}")
            if a["op"] != "count" and not a.get("col"):
                raise ValueError(f"aggregate {a['op']!r} needs a col")
        mv_dir = os.path.join(self.lake_dir, "mv", name)
        os.makedirs(mv_dir, exist_ok=True)
        with open(os.path.join(mv_dir, "spec.json"), "w") as f:
            json.dump({"aggs": aggs}, f)

    def _mv_aggs(self, name: str, plan) -> list[dict]:
        spec_path = os.path.join(self.lake_dir, "mv", name, "spec.json")
        if os.path.exists(spec_path):
            with open(spec_path) as f:
                return json.load(f)["aggs"]
        # legacy default view: row count + sum of the first integer payload
        # column (NULLs skipped, matching SQL ``sum``)
        num_cols = [
            f.name
            for f in plan.schema_at()
            if pa.types.is_integer(f.type) and f.name not in plan.keys()
        ]
        aggs = [{"op": "count", "col": None, "alias": "n_rows"}]
        if num_cols:
            aggs.append({"op": "sum", "col": num_cols[0], "alias": "sum_val"})
        return aggs

    def update_mv(self, name: str = "conv_stats") -> list[int]:
        """Incremental materialized-view maintenance (the CDC-downstream
        aggregate): per-group aggregates over the lake, refreshed ONLY for
        partitions touched by the latest epoch — group columns are the
        partition key, so each group lives wholly inside one partition and
        an epoch's MV refresh rewrites exactly the partitions it changed
        (O(touched), never O(P), never a global shuffle).

        The view's aggregate list comes from :meth:`define_mv` (or the
        legacy count+sum default); the per-partition aggregate itself is a
        zero-copy ``pyarrow.TableGroupBy`` — no pandas round-trip of the
        wide payload.  Returns the refreshed partition ids."""
        plan = self.committed_plan()
        group_cols = plan.partition_columns()
        aggs = self._mv_aggs(name, plan)
        epoch = self.manifest.epoch
        # stale = data lineage advanced past the last refresh of THIS view
        # (catches partitions touched in ANY epoch since, not just the
        # latest; per-view key so sibling views track independently —
        # the legacy key name is kept for the default view's lineage)
        mvk = "mv_epoch" if name == "conv_stats" else f"mv_epoch:{name}"
        touched = [
            pid
            for pid, st in sorted(self.manifest.partitions.items())
            if st.files
            and int(st.lineage.get("epoch", -1)) > int(st.lineage.get(mvk, -1))
        ]
        if not touched:
            return []
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()
        lake_dir = self.lake_dir
        mv_dir = os.path.join(self.lake_dir, "mv", name)
        os.makedirs(mv_dir, exist_ok=True)
        items = [
            {
                "pid": pid,
                "files": list(self.manifest.partitions[pid].files),
                "vers": self.manifest.partitions[pid].versions(),
            }
            for pid in touched
        ]

        def refresh(batch: pd.DataFrame) -> pa.Table:
            from tapdata_connectors_ray.stages.merge import lww_merge_tables

            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            keys = plan_l.keys()
            out_schema = merged_schema(plan_l.schema_at())
            # declarative spec -> Arrow grouped-aggregate plan (zero-copy;
            # ScalarAggregateOptions default min_count=1 matches SQL sum/min/
            # max null handling)
            pa_aggs, renames = [], {}
            for a in aggs:
                if a["op"] == "count":
                    pa_aggs.append(([], "count_all"))
                    renames["count_all"] = a["alias"]
                else:
                    pa_aggs.append((a["col"], a["op"]))
                    renames[f"{a['col']}_{a['op']}"] = a["alias"]
            out_cols = list(group_cols) + [a["alias"] for a in aggs]
            rows = []
            for _, row in batch.iterrows():
                pid = int(row["pid"])
                tables = [
                    _lake_file_to_table(f, plan_l, int(v))
                    for f, v in zip(row["files"], row["vers"])
                ]
                merged = lww_merge_tables(tables, out_schema, keys)
                agg = merged.group_by(group_cols).aggregate(pa_aggs)
                agg = agg.rename_columns(
                    [renames.get(c, c) for c in agg.column_names]
                ).select(out_cols)
                agg = agg.sort_by([(c, "ascending") for c in group_cols])
                out = os.path.join(mv_dir, f"p={pid:05d}.parquet")
                atomic_put_parquet(agg, out)
                rows.append({"partition_id": pid})
            return pa.Table.from_pylist(rows)

        (
            ray.data.from_items(items)
            .map_batches(refresh, batch_format="pandas", batch_size=1)
            .take_all()
        )
        for pid in touched:
            st = self.manifest.partitions[pid]
            st.lineage[mvk] = epoch
        commit_manifest(self.lake_dir, self.manifest)
        return touched

    def mv_dataset(self, name: str = "conv_stats") -> ray.data.Dataset:
        mv_dir = os.path.join(self.lake_dir, "mv", name)
        files = sorted(
            os.path.join(mv_dir, f)
            for f in os.listdir(mv_dir)
            if f.endswith(".parquet")
        )
        return ray.data.read_parquet(files)

    def _update_kernel_mv(self, name: str, kernel) -> list[int]:
        """Shared incremental refresh for KERNEL views — views whose content
        is an arbitrary per-partition function of the merged lake state
        (render, loss mask, ...), not a declarative aggregate.  Each refresh
        re-computes ONLY the partitions whose data lineage advanced past the
        view's last refresh (conversations are partition-local, so a touched
        partition's view file is the exact blast radius of its epochs); the
        per-view staleness key rides the same lineage mechanism as the
        aggregate MVs.  ``kernel``: module-level fn, merged table -> view
        table.  Returns the refreshed partition ids."""
        plan = self.committed_plan()
        epoch = self.manifest.epoch
        mvk = f"mv_epoch:{name}"
        touched = [
            pid
            for pid, st in sorted(self.manifest.partitions.items())
            if st.files
            and int(st.lineage.get("epoch", -1)) > int(st.lineage.get(mvk, -1))
        ]
        if not touched:
            return []
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()
        mv_dir = os.path.join(self.lake_dir, "mv", name)
        os.makedirs(mv_dir, exist_ok=True)
        items = [
            {
                "pid": pid,
                "files": list(self.manifest.partitions[pid].files),
                "vers": self.manifest.partitions[pid].versions(),
            }
            for pid in touched
        ]

        def refresh(batch: pd.DataFrame) -> pa.Table:
            from tapdata_connectors_ray.stages.merge import lww_merge_tables

            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            keys = plan_l.keys()
            out_schema = merged_schema(plan_l.schema_at())
            rows = []
            for _, row in batch.iterrows():
                pid = int(row["pid"])
                tables = [
                    _lake_file_to_table(f, plan_l, int(v))
                    for f, v in zip(row["files"], row["vers"])
                ]
                merged = lww_merge_tables(tables, out_schema, keys)
                out = os.path.join(mv_dir, f"p={pid:05d}.parquet")
                atomic_put_parquet(kernel(merged), out)
                rows.append({"partition_id": pid})
            return pa.Table.from_pylist(rows)

        (
            ray.data.from_items(items)
            .map_batches(refresh, batch_format="pandas", batch_size=1)
            .take_all()
        )
        for pid in touched:
            st = self.manifest.partitions[pid]
            st.lineage[mvk] = epoch
        commit_manifest(self.lake_dir, self.manifest)
        return touched

    def update_render_mv(self) -> list[int]:
        """Incrementally-maintained RENDERED-TRANSCRIPT view — the training
        sample a consumer actually reads, kept fresh by CDC.  The render
        kernel is the same Arrow-native assembly the fused replay render
        uses (``replay.render_merged_table``)."""
        from tapdata_connectors_ray.pipelines.replay import render_merged_table

        return self._update_kernel_mv("__render__", render_merged_table)

    def render_mv_dataset(self) -> ray.data.Dataset:
        return self.mv_dataset("__render__")

    def update_loss_mask_mv(self) -> list[int]:
        """Incrementally-maintained LOSS-MASK view — per-conversation SFT
        token budgets (total vs loss-bearing) kept fresh by CDC; kernel
        shared bit-for-bit with the fused ``transcript_loss_mask`` query
        (``replay.loss_mask_merged_table``)."""
        from tapdata_connectors_ray.pipelines.replay import loss_mask_merged_table

        return self._update_kernel_mv("__loss_mask__", loss_mask_merged_table)

    def loss_mask_mv_dataset(self) -> ray.data.Dataset:
        return self.mv_dataset("__loss_mask__")

    def dataset_at(self, epoch: int) -> ray.data.Dataset:
        """Time-travel read: the lake AS OF an earlier committed epoch (the
        lake-table commit timeline: every commit snapshots its manifest under
        ``history/``; rewrite epochs leave prior partition files on disk, so
        any epoch not yet GC'd by a compaction is readable)."""
        m = load_manifest_at(self.lake_dir, epoch)
        if m is None:
            raise ValueError(f"epoch {epoch} was never committed in {self.lake_dir}")
        return self.final_dataset(manifest=m)

    def resync_partition(
        self,
        pid: int,
        events_path: str | list[str],
        base_path: str | list[str] | None = None,
    ) -> Manifest:
        """Partial re-sync of ONE lake partition (the reference's reset /
        re-sync of a table subset without touching the rest of the task):
        the partition's state is dropped and committed, then a normal ingest
        re-applies snapshot + full log — every OTHER partition's applied-LSN
        watermark filters its events to nothing (vectorized drop in
        normalize) and its base rows are guarded by the resurrection check,
        so only the reset partition is rebuilt.

        Scale note: the log is still SCANNED once (hash partitioning can't
        be pruned at the parquet read); what's avoided is the rewrite —
        one partition's merge + file, not P of them.

        Time travel: the drop lands as its OWN epoch (never rewriting an
        already-committed history manifest), and — like ``compact`` — the
        dropped files are GC'd after the commit, so ``dataset_at`` for
        epochs that referenced the reset partition's old files will fail on
        the missing files.  A resync is a declaration that the partition's
        history was wrong; keeping it readable would defeat the point."""
        st = self.manifest.partitions.pop(pid, None)
        if st is not None:
            drop = Manifest(
                num_partitions=self.manifest.num_partitions,
                epoch=self.manifest.epoch + 1,
                schema_version=self.manifest.schema_version,
                ddl_history=list(self.manifest.ddl_history),
                table_spec=self.manifest.table_spec,
                partitions=dict(self.manifest.partitions),
            )
            commit_manifest(self.lake_dir, drop, expected_epoch=drop.epoch - 1)
            self.manifest = drop
            for f in st.files:  # invisible after the swap; best-effort GC
                try:
                    os.remove(f)
                except OSError:
                    pass
        return self.ingest(events_path, base_path)

    def scd2_apply_epoch(
        self,
        events_path: str | list[str],
        base_path: str | list[str] | None = None,
        *,
        end_lsn: int | None = None,
    ) -> Manifest:
        """One epoch of the INCREMENTAL SCD Type 2 history sink: the epoch's
        events close the currently-open versions of exactly the keys they
        touch and append the epoch's own closed/open version chains — the
        history analogue of the LWW ingest, with the same exactly-once
        machinery (watermark drop, manifest CAS, idempotent file names).

        Ledger layout per partition: immutable ``hist-{epoch}`` files hold
        CLOSED versions (append-only — an epoch never rewrites history) and
        one ``open-{epoch}`` file holds the current open set, rewritten only
        when the partition is touched.  Epoch cost therefore tracks the
        epoch's events + open-set size, never the accumulated history — the
        property that makes a 10^10-event history sink ingestible.  The
        union of all files read back equals the batch ``scd2_history`` (same
        DuckDB oracle)."""
        from tapdata_connectors_ray.pipelines.replay import (
            _dedup_sorted_frame,
            _same_next_key,
            normalized_events,
            scan_evolution_plan_distributed,
        )

        plan = scan_evolution_plan_distributed(events_path, self.spec)
        if self.manifest.ddl_history:
            plan = EvolutionPlan.from_json(
                self.manifest.ddl_history, spec=self.spec
            ).merged_with(plan)
        if end_lsn is not None:
            plan = EvolutionPlan(
                changes=[c for c in plan.changes if c.lsn <= end_lsn],
                base_version=plan.base_version,
                spec=plan.spec,
            )
        keys = plan.keys()
        payload_schema = plan.schema_at()
        payload_names = payload_schema.names
        hist_schema = pa.schema(
            [*payload_schema,
             ("valid_from", pa.int64()), ("valid_to", pa.int64()),
             ("is_current", pa.int64())]
        )

        wm_ref = ray.put(self.manifest.watermarks())
        ev = normalized_events(
            events_path,
            base_path,
            plan=plan,
            num_partitions=self.num_partitions,
            prereduce=False,
            watermarks=wm_ref,
            base_watermarks=wm_ref,
            batch_size=self.batch_size,
            max_lsn=end_lsn,
        )
        epoch = self.manifest.epoch + 1
        prev = {
            pid: (list(st.files), st.versions())
            for pid, st in self.manifest.partitions.items()
        }
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()
        lake_dir = self.lake_dir

        def apply_group(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc  # noqa: F401  (parity with sibling closures)

            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            pid = int(t["partition_id"][0].as_py())
            df, take_idx = _dedup_sorted_frame(t, keys)
            n = len(df)
            lsn = df["__lsn"].to_numpy()
            op = df["__op"].to_numpy()
            same_next = _same_next_key(df, keys)
            nxt = np.empty(n, dtype=np.int64)
            if n:
                nxt[:-1] = lsn[1:]
                nxt[-1] = -1
            valid_to = np.where(same_next, nxt, -1)
            keep = op != "D"

            def versions_of(mask: np.ndarray, vt: np.ndarray | None) -> pa.Table:
                sel = np.asarray(take_idx[mask])
                out = t.select(payload_names).take(sel)
                for f in payload_schema:
                    if not out.schema.field(f.name).type.equals(f.type):
                        i = out.schema.get_field_index(f.name)
                        out = out.set_column(i, f.name, out[f.name].cast(f.type, safe=True))
                out = out.append_column("valid_from", pa.array(lsn[mask], pa.int64()))
                if vt is None:
                    out = out.append_column(
                        "valid_to", pa.array([None] * len(sel), pa.int64())
                    )
                    cur = np.ones(len(sel), dtype=np.int64)
                else:
                    out = out.append_column("valid_to", pa.array(vt[mask], pa.int64()))
                    cur = np.zeros(len(sel), dtype=np.int64)
                return out.append_column("is_current", pa.array(cur, pa.int64()))

            closed_new = versions_of(keep & (valid_to >= 0), valid_to)
            open_new = versions_of(keep & (valid_to < 0), None)

            # previous open set: versions closed by this epoch's first event
            # per key; untouched open rows carry forward verbatim
            open_carry = hist_schema.empty_table()
            closed_prev = hist_schema.empty_table()
            files, vers = prev.get(pid, ([], []))
            open_files = [
                (f, v) for f, v in zip(files, vers)
                if os.path.basename(f).startswith("open-")
            ]
            if open_files:
                po = pa.concat_tables(
                    [_lake_file_to_table(f, plan_l, int(v)) for f, v in open_files],
                    promote_options="default",
                ).select(hist_schema.names)
                starts = (
                    np.concatenate(([0], np.flatnonzero(~same_next[:-1]) + 1))
                    if n > 1 else (np.array([0], dtype=np.int64) if n else
                                   np.array([], dtype=np.int64))
                )
                pk = pd.DataFrame({k: po[k].to_numpy(zero_copy_only=False) for k in keys})
                pk["__pos"] = np.arange(len(pk))
                fk = pd.DataFrame(
                    {k: df[k].to_numpy()[starts] for k in keys}
                )
                fk["__first"] = lsn[starts]
                mg = pk.merge(fk, on=keys, how="left")
                hit = mg["__first"].notna().to_numpy()
                pos = mg["__pos"].to_numpy()
                if hit.any():
                    cp = po.take(pa.array(pos[hit], pa.int64()))
                    i_vt = cp.schema.get_field_index("valid_to")
                    cp = cp.set_column(
                        i_vt, "valid_to",
                        pa.array(mg.loc[hit, "__first"].to_numpy(dtype=np.int64),
                                 pa.int64()),
                    )
                    i_c = cp.schema.get_field_index("is_current")
                    closed_prev = cp.set_column(
                        i_c, "is_current",
                        pa.array(np.zeros(int(hit.sum()), dtype=np.int64), pa.int64()),
                    )
                if (~hit).any():
                    open_carry = po.take(pa.array(pos[~hit], pa.int64()))

            def conform(tb: pa.Table) -> pa.Table:
                for f in hist_schema:
                    if not tb.schema.field(f.name).type.equals(f.type):
                        i = tb.schema.get_field_index(f.name)
                        tb = tb.set_column(i, f.name, tb[f.name].cast(f.type, safe=True))
                return tb.select(hist_schema.names)

            hist_t = pa.concat_tables(
                [conform(closed_prev), conform(closed_new)], promote_options="default"
            )
            open_t = pa.concat_tables(
                [conform(open_carry), conform(open_new)], promote_options="default"
            )
            pdir = partition_dir(lake_dir, pid)
            hist_f = os.path.join(pdir, f"hist-{epoch:06d}.parquet")
            open_f = os.path.join(pdir, f"open-{epoch:06d}.parquet")
            if hist_t.num_rows:
                atomic_put_parquet(hist_t, hist_f)
            atomic_put_parquet(open_t, open_f)
            return pa.Table.from_pylist(
                [{
                    "partition_id": pid,
                    "hist_file": hist_f if hist_t.num_rows else "",
                    "open_file": open_f,
                    "open_rows": open_t.num_rows,
                    "max_lsn": int(lsn.max()) if n else -1,
                }]
            )

        results = (
            ev.groupby("partition_id")
            .map_groups(
                apply_group,
                batch_format="pyarrow",
                max_retries=SINK_MAX_RETRIES,
                retry_exceptions=list(RETRYABLE_SINK_EXCEPTIONS),
            )
            .take_all()
        )
        new = Manifest(
            num_partitions=self.num_partitions,
            epoch=epoch,
            schema_version=plan.latest_version,
            ddl_history=plan.to_json(),
            table_spec=self.spec.to_json(),
            partitions=dict(self.manifest.partitions),
        )
        superseded: list[str] = []
        for r in results:
            pid = int(r["partition_id"])
            old = self.manifest.partitions.get(pid)
            carried, carried_v = [], []
            if old is not None:
                for f, v in zip(old.files, old.versions()):
                    if os.path.basename(f).startswith("open-"):
                        superseded.append(f)
                    else:
                        carried.append(f)
                        carried_v.append(v)
            files = [r["open_file"], *carried]
            fvers = [plan.latest_version, *carried_v]
            if r["hist_file"]:
                files.append(r["hist_file"])
                fvers.append(plan.latest_version)
            prev_wm = old.applied_lsn if old else -1
            new.partitions[pid] = PartitionState(
                applied_lsn=max(prev_wm, int(r["max_lsn"])),
                files=files,
                file_versions=fvers,
                rows=int(r["open_rows"]),
                schema_version=plan.latest_version,
                lineage={**(old.lineage if old else {}), "scd2_epoch": epoch},
            )
        commit_manifest(self.lake_dir, new, expected_epoch=new.epoch - 1)
        self.manifest = new
        for f in superseded:  # invisible after the swap; best-effort GC
            try:
                os.remove(f)
            except OSError:
                pass
        return new

    def scd2_dataset(self) -> ray.data.Dataset:
        """Read back the full SCD2 history: per partition, the union of the
        immutable ``hist-*`` files and the current ``open-*`` file (one task
        per partition, no shuffle — partitions are key-disjoint)."""
        plan = self.committed_plan()
        cols = [*plan.schema_at().names, "valid_from", "valid_to", "is_current"]
        items = self._partition_items()
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()
        if not items:
            import pyarrow as _pa

            empty = _pa.schema(
                [*plan.schema_at(),
                 ("valid_from", _pa.int64()), ("valid_to", _pa.int64()),
                 ("is_current", _pa.int64())]
            )
            return ray.data.from_arrow(empty.empty_table())

        def read_one(batch: pd.DataFrame) -> pa.Table:
            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            outs = []
            for _, row in batch.iterrows():
                for f, v in zip(row["files"], row["vers"]):
                    outs.append(
                        _lake_file_to_table(f, plan_l, int(v)).select(cols)
                    )
            return pa.concat_tables(outs, promote_options="default")

        return ray.data.from_items(items).map_batches(
            read_one, batch_format="pandas", batch_size=1
        )

    def changes_between(self, from_epoch: int, to_epoch: int | None = None) -> ray.data.Dataset:
        """Lake-native change-data-feed: the net I/U/D row delta between two
        COMMITTED epochs, computed from the manifests alone — partitions
        whose file lists are identical in both commits are PRUNED without
        reading a byte (the Delta CDF / Hudi incremental-query economics:
        diff cost tracks touched partitions, not lake size).

        Per changed partition, both states merge from their own file stacks
        (each file migrated per its recorded schema version, so a diff
        across a DDL boundary compares in the newer schema) and the diff is
        a key outer-join + Arrow column compare — post-image on I/U,
        pre-image on D, silent on keys whose state is byte-equal even when
        the epoch rewrote their partition file."""
        m1 = load_manifest_at(self.lake_dir, from_epoch)
        if m1 is None:
            raise ValueError(f"epoch {from_epoch} was never committed in {self.lake_dir}")
        m2 = self.manifest if to_epoch is None else load_manifest_at(self.lake_dir, to_epoch)
        if m2 is None:
            raise ValueError(f"epoch {to_epoch} was never committed in {self.lake_dir}")
        plan = self.committed_plan(m2)
        keys = plan.keys()
        payload_schema = plan.schema_at()
        payload_names = payload_schema.names
        out_schema = pa.schema([("op_cdf", pa.string()), *payload_schema])

        items = []
        for pid in sorted(set(m1.partitions) | set(m2.partitions)):
            s1 = m1.partitions.get(pid)
            s2 = m2.partitions.get(pid)
            f1 = list(s1.files) if s1 else []
            f2 = list(s2.files) if s2 else []
            if f1 == f2:
                continue  # untouched partition: pruned, never read
            items.append(
                {"pid": pid, "files1": f1, "vers1": s1.versions() if s1 else [],
                 "files2": f2, "vers2": s2.versions() if s2 else []}
            )
        if not items:
            return ray.data.from_arrow(out_schema.empty_table())
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()
        non_key = [n for n in payload_names if n not in keys]

        def diff_one(batch: pd.DataFrame) -> pa.Table:
            import pyarrow.compute as pc

            from tapdata_connectors_ray.stages.merge import lww_merge_tables

            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            out_sch = merged_schema(plan_l.schema_at())
            outs = []

            def state(files, vers) -> pa.Table:
                if not files:
                    return out_sch.empty_table()
                missing = [f for f in files if not os.path.exists(f)]
                if missing:
                    # erasure/resync epochs GC superseded files at commit;
                    # their pre-images are gone BY CONTRACT (a retention
                    # delete that stayed CDF-readable would not be erasure)
                    raise ValueError(
                        "changes_between: epoch files erased by a later "
                        f"retention/resync commit: {missing[:3]}"
                    )
                tables = [_lake_file_to_table(f, plan_l, int(v)) for f, v in zip(files, vers)]
                return lww_merge_tables(tables, out_sch, keys)

            def image(t: pa.Table, idx: np.ndarray, tag: str) -> pa.Table:
                sel = t.select(payload_names).take(pa.array(idx, pa.int64()))
                tags = pa.array(np.full(len(idx), tag, dtype=object), pa.string())
                return pa.table(
                    {"op_cdf": tags, **{n: sel[n] for n in payload_names}},
                    schema=out_schema,
                )

            for _, row in batch.iterrows():
                t1 = state(row["files1"], row["vers1"])
                t2 = state(row["files2"], row["vers2"])
                k1 = pd.DataFrame({k: t1[k].to_numpy(zero_copy_only=False) for k in keys})
                k1["__p1"] = np.arange(len(k1))
                k2 = pd.DataFrame({k: t2[k].to_numpy(zero_copy_only=False) for k in keys})
                k2["__p2"] = np.arange(len(k2))
                mg = k1.merge(k2, on=keys, how="outer")
                ins = mg["__p1"].isna() & mg["__p2"].notna()
                dele = mg["__p2"].isna() & mg["__p1"].notna()
                both = mg["__p1"].notna() & mg["__p2"].notna()
                if both.any():
                    i1 = mg.loc[both, "__p1"].to_numpy(dtype=np.int64)
                    i2 = mg.loc[both, "__p2"].to_numpy(dtype=np.int64)
                    diff = np.zeros(len(i1), dtype=bool)
                    for name in non_key:
                        a = t1[name].take(pa.array(i1, pa.int64()))
                        b = t2[name].take(pa.array(i2, pa.int64()))
                        neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(
                            zero_copy_only=False
                        )
                        one_null = pc.xor(pc.is_null(a), pc.is_null(b)).to_numpy(
                            zero_copy_only=False
                        )
                        diff |= np.asarray(neq, bool) | np.asarray(one_null, bool)
                    if diff.any():
                        outs.append(image(t2, i2[diff], "U"))
                if ins.any():
                    outs.append(
                        image(t2, mg.loc[ins, "__p2"].to_numpy(dtype=np.int64), "I")
                    )
                if dele.any():
                    outs.append(
                        image(t1, mg.loc[dele, "__p1"].to_numpy(dtype=np.int64), "D")
                    )
            if not outs:
                return out_schema.empty_table()
            return pa.concat_tables(outs)

        return ray.data.from_items(items).map_batches(
            diff_one, batch_format="pandas", batch_size=1
        )

    def forget_keys(self, values: list, column: str | None = None) -> Manifest:
        """Retention / right-to-be-forgotten delete: physically remove every
        row whose partition-key ``column`` is in ``values`` from the lake —
        rewriting ONLY the partitions those keys hash to (the GDPR-delete
        shape of Delta `DELETE WHERE` + VACUUM; reference analogue: the
        plain DML delete path, ``CommonDbConnector.java`` ``writeRecord``
        delete branch — but here as a lake-file rewrite, because a
        tombstone is not erasure).

        Scale shape: affected partitions come from HASHING the key list
        (never scanning the lake); each affected partition's file stack is
        rewritten file-by-file in one Ray task per partition with only that
        partition's key subset shipped.  Untouched partitions keep their
        exact files.  Tombstones for forgotten keys are dropped too (they
        name the subject).  The rewrite commits as one epoch via the same
        manifest CAS; superseded files are GC'd after the swap, and a
        ``vacuum`` erases them from older retained history."""
        from tapdata_connectors_ray.functions.hashing import partition_ids_for

        plan = self.committed_plan()
        column = column or plan.partition_columns()[0]
        vals = pd.Series(values).drop_duplicates()
        key_t = pa.table({column: pa.array(vals, pa.string())})
        pids = partition_ids_for(key_t, [column], self.num_partitions)
        by_pid: dict[int, list] = {}
        for v, p in zip(vals, pids):
            by_pid.setdefault(int(p), []).append(v)
        items = [
            {"pid": pid, "forget": keys,
             "files": list(self.manifest.partitions[pid].files),
             "vers": self.manifest.partitions[pid].versions()}
            for pid, keys in sorted(by_pid.items())
            if pid in self.manifest.partitions and self.manifest.partitions[pid].files
        ]
        if not items:
            return self.manifest
        epoch = self.manifest.epoch + 1
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()
        lake_dir = self.lake_dir

        def forget_one(batch: pd.DataFrame) -> pa.Table:
            import pyarrow.compute as pc

            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            rows = []
            for _, row in batch.iterrows():
                pid = int(row["pid"])
                forget = pa.array(list(row["forget"]), pa.string())
                new_files, new_vers, dropped, kept_rows = [], [], 0, 0
                for f, v in zip(row["files"], row["vers"]):
                    t = _lake_file_to_table(f, plan_l, int(v))
                    keep = pc.invert(pc.is_in(t[column], value_set=forget))
                    out_t = t.filter(keep)
                    dropped += len(t) - len(out_t)
                    base = os.path.basename(f)
                    stem = base[: -len(".parquet")]
                    out = os.path.join(
                        partition_dir(lake_dir, pid), f"{stem}-f{epoch:06d}.parquet"
                    )
                    atomic_put_parquet(out_t, out)
                    new_files.append(out)
                    new_vers.append(plan_l.latest_version)
                    kept_rows += len(out_t)
                rows.append(
                    {"partition_id": pid, "files": new_files, "vers": new_vers,
                     "rows": kept_rows, "dropped": dropped}
                )
            return pa.Table.from_pylist(rows)

        results = (
            ray.data.from_items(items)
            .map_batches(forget_one, batch_format="pandas", batch_size=1)
            .take_all()
        )
        new = Manifest(
            num_partitions=self.num_partitions,
            epoch=epoch,
            schema_version=plan.latest_version,
            ddl_history=plan.to_json(),
            table_spec=self.spec.to_json(),
            partitions=dict(self.manifest.partitions),
        )
        superseded: list[str] = []
        for r in results:
            pid = int(r["partition_id"])
            old = self.manifest.partitions[pid]
            superseded.extend(old.files)
            new.partitions[pid] = PartitionState(
                applied_lsn=old.applied_lsn,
                files=list(r["files"]),
                file_versions=[int(v) for v in r["vers"]],
                rows=int(r["rows"]),
                schema_version=plan.latest_version,
                # "epoch" is the last DATA-changing epoch — a retention
                # rewrite counts, so downstream MVs see these partitions as
                # stale and refresh them
                lineage={**old.lineage, "epoch": epoch,
                         "retention_epoch": epoch,
                         "forgotten_rows": int(r["dropped"])},
            )
        commit_manifest(self.lake_dir, new, expected_epoch=new.epoch - 1)
        self.manifest = new
        for f in superseded:  # invisible after the swap; best-effort GC
            try:
                os.remove(f)
            except OSError:
                pass
        return new

    def split_partitions(self, factor: int = 2) -> Manifest:
        """Online partition-count growth — resharding WITHOUT a shuffle:
        because partition ids are ``hash % P``, growing to ``P' = factor*P``
        maps every key of old partition ``h`` to one of ``{h, h+P, ...,
        h+(factor-1)P}`` — a PARTITION-LOCAL split.  Each old partition's
        stack compacts (dedup + LWW + tombstone drop, exactly ``compact``'s
        contract) and fans out into its ``factor`` children in ONE task; no
        row ever crosses partitions, so the operation is map-shaped at any
        lake size.  Children inherit the parent's applied-LSN watermark (an
        event the parent absorbed is absorbed by whichever child its key
        now maps to), so ingest continues exactly where it left off at the
        new width.  Commits as one epoch via the same manifest CAS; the
        reverse direction (merging partitions) is the same local property.

        This is the grow-the-lake operation a 10^10-event table needs when
        live-keys/partition outgrows a worker — at fixed P that ratio only
        climbs; with local splits it is a knob."""
        if factor < 2:
            raise ValueError("factor must be >= 2")
        plan = self.committed_plan()
        old_p = self.num_partitions
        new_p = old_p * factor
        epoch = self.manifest.epoch + 1
        items = self._partition_items()
        plan_json = plan.to_json()
        spec_json = self.spec.to_json()
        lake_dir = self.lake_dir
        pcols = plan.partition_columns()

        def split_one(batch: pd.DataFrame) -> pa.Table:
            from tapdata_connectors_ray.functions.hashing import partition_ids_for
            from tapdata_connectors_ray.stages.merge import lww_merge_tables

            plan_l = EvolutionPlan.from_json(plan_json, spec=TableSpec.from_json(spec_json))
            keys = plan_l.keys()
            out_schema = merged_schema(plan_l.schema_at())
            rows = []
            for _, row in batch.iterrows():
                pid = int(row["pid"])
                tables = [
                    _lake_file_to_table(f, plan_l, int(v))
                    for f, v in zip(row["files"], row["vers"])
                ]
                merged = lww_merge_tables(tables, out_schema, keys)
                child_ids = partition_ids_for(merged, pcols, new_p)
                # the local-split invariant: every child id ≡ pid (mod old_p)
                assert (child_ids % old_p == pid).all(), "hash family broke locality"
                for child in np.unique(child_ids):
                    part = merged.filter(pa.array(child_ids == child))
                    out = os.path.join(
                        partition_dir(lake_dir, int(child)),
                        f"part-{epoch:06d}.parquet",
                    )
                    atomic_put_parquet(part, out)
                    rows.append(
                        {"parent": pid, "partition_id": int(child),
                         "file": out, "rows": part.num_rows}
                    )
            return pa.Table.from_pylist(rows)

        results = (
            ray.data.from_items(items)
            .map_batches(split_one, batch_format="pandas", batch_size=1)
            .take_all()
        ) if items else []
        new = Manifest(
            num_partitions=new_p,
            epoch=epoch,
            schema_version=plan.latest_version,
            ddl_history=plan.to_json(),
            table_spec=self.spec.to_json(),
            partitions={},
        )
        superseded: list[str] = []
        for r in results:
            parent = self.manifest.partitions[int(r["parent"])]
            new.partitions[int(r["partition_id"])] = PartitionState(
                applied_lsn=parent.applied_lsn,
                files=[r["file"]],
                file_versions=[plan.latest_version],
                rows=int(r["rows"]),
                schema_version=plan.latest_version,
                lineage={"epoch": epoch, "split_from": int(r["parent"]),
                         "watermark_ts": int(parent.lineage.get("watermark_ts", -1))},
            )
        for st in self.manifest.partitions.values():
            superseded.extend(st.files)
        commit_manifest(self.lake_dir, new, expected_epoch=new.epoch - 1)
        self.manifest = new
        self.num_partitions = new_p
        for f in superseded:  # invisible after the swap; best-effort GC
            try:
                os.remove(f)
            except OSError:
                pass
        return new

    def vacuum(self, retain_last: int = 2) -> dict:
        """Lake vacuum — the Hudi cleaner / Delta VACUUM analogue: drop
        history manifests beyond the newest ``retain_last`` and delete every
        data file no RETAINED commit references (superseded rewrite files,
        orphans from crashed or fenced writers, stray ``.tmp`` parts).

        Time travel stays valid for exactly the retained epochs; anything
        older raises on read (the documented compact/resync GC contract,
        now with an explicit retention knob).  Returns removal counts."""
        epochs = committed_epochs(self.lake_dir)
        retained = set(epochs[-retain_last:]) if retain_last > 0 else set()
        retained.add(self.manifest.epoch)
        live: set[str] = set(self.manifest.all_files())
        removed_history = 0
        for ep in epochs:
            if ep in retained:
                m = load_manifest_at(self.lake_dir, ep)
                if m is not None:
                    live.update(m.all_files())
            else:
                try:
                    os.remove(
                        os.path.join(
                            self.lake_dir, "history", f"manifest-{ep:06d}.json"
                        )
                    )
                    removed_history += 1
                except OSError:
                    pass
        removed_files = 0
        from tapdata_connectors_ray.sources.storage import LOCAL

        parts_root = os.path.join(self.lake_dir, "partitions")
        if os.path.isdir(parts_root):
            # listing + delete go through the SPI surface (recursive list is
            # an object-store prefix scan), so vacuum ports with the backend
            for st in LOCAL.list(parts_root, suffixes=("",), recursive=True):
                p = st.path
                if p in live:
                    continue
                name = os.path.basename(p)
                if name.endswith(".parquet") or ".parquet.tmp-" in name:
                    try:
                        LOCAL.delete(p)
                        removed_files += 1
                    except OSError:
                        pass
        return {"removed_files": removed_files, "removed_history": removed_history}

    def clear_table(self) -> None:
        """``clearTable`` analogue (``CommonDbConnector.java:352-362``):
        drop all partition data, keep the (empty) table + schema history."""
        import shutil

        for st in self.manifest.partitions.values():
            for f in st.files:
                try:
                    os.remove(f)
                except OSError:
                    pass
        shutil.rmtree(os.path.join(self.lake_dir, "partitions"), ignore_errors=True)
        self.manifest = Manifest(
            num_partitions=self.num_partitions,
            epoch=self.manifest.epoch + 1,
            schema_version=self.manifest.schema_version,
            ddl_history=list(self.manifest.ddl_history),
        )
        commit_manifest(self.lake_dir, self.manifest)

    def drop_table(self) -> None:
        """``dropTable`` analogue: remove the lake directory entirely."""
        import shutil

        shutil.rmtree(self.lake_dir, ignore_errors=True)

    def metrics(self) -> dict:
        """Per-partition throughput/lag surface (north rule: metrics exported)."""
        wm = self.manifest.watermarks()
        live = wm[wm >= 0]
        wts = [
            int(st.lineage.get("watermark_ts", -1))
            for st in self.manifest.partitions.values()
        ]
        live_ts = [w for w in wts if w >= 0]
        return {
            "epoch": self.manifest.epoch,
            "partitions": int((wm >= 0).sum()),
            "rows": int(sum(st.rows for st in self.manifest.partitions.values())),
            "applied_lsn_min": int(live.min()) if len(live) else -1,
            "applied_lsn_max": int(live.max()) if len(live) else -1,
            # source-clock watermark spread: min = laggiest partition (lag =
            # now - min), max = stream head reached
            "watermark_ts_min": min(live_ts) if live_ts else -1,
            "watermark_ts_max": max(live_ts) if live_ts else -1,
            "schema_version": self.manifest.schema_version,
        }


class JoinMaterializedView:
    """Incrementally-maintained JOIN view across TWO co-partitioned lakes.

    The fact lake (transcripts, keyed by (conv_id, turn_idx)) and the
    dimension lake (conversations, keyed by conv_id) both hash-partition on
    the JOIN key, so view partition ``p`` depends on exactly fact partition
    ``p`` and dim partition ``p`` — a refresh is PARTITION-LOCAL: no shuffle,
    no cross-partition read, ever.  Staleness is tracked per (partition,
    side): a fact epoch refreshes only the partitions it touched; a dim
    epoch likewise; an untouched partition's view file is never rewritten.

    Semantics: per-conversation fact aggregate (``n_turns``, ``sum_score``)
    LEFT JOINed with the dimension's current row — a conversation whose dim
    row is missing or deleted keeps NULL attributes (the reference's
    master/detail lookup shape over a multi-table sync task, here maintained
    as a lake view instead of a per-event processor).

    At 100 TB: refresh cost is O(touched partitions) map tasks, each bounded
    by one partition's live keys on both sides; the view state file is
    O(P) — metadata scale.  Reference: multi-table task + merge-table
    processor (survey §2.6, §3.1).

    Crash model: per-partition files land via ``atomic_put``; the state
    file (written LAST, atomically) is the refresh's commit point — a crash
    mid-refresh leaves state behind data, so the re-opened view simply
    re-refreshes the same stale set (idempotent rewrites).  Like
    ``CheckpointedIngest``, the view assumes ONE driver-side coordinator;
    concurrent refreshers of the same view dir are fenced at the lake
    layer, not here."""

    STATE_FILE = "join_state.json"

    def __init__(
        self,
        out_dir: str,
        fact: CheckpointedIngest,
        dim: CheckpointedIngest,
    ):
        if fact.num_partitions != dim.num_partitions:
            raise ValueError(
                f"co-partitioning violated: fact P={fact.num_partitions} "
                f"!= dim P={dim.num_partitions}"
            )
        fcols = fact.spec.effective_partition_columns()
        dcols = dim.spec.effective_partition_columns()
        if fcols != dcols:
            raise ValueError(
                f"join key mismatch: fact partitions on {fcols}, dim on {dcols}"
            )
        self.join_cols = list(fcols)
        self.out_dir = out_dir
        self.fact = fact
        self.dim = dim
        os.makedirs(os.path.join(out_dir, "rollup"), exist_ok=True)
        sp = os.path.join(out_dir, self.STATE_FILE)
        if os.path.exists(sp):
            with open(sp) as f:
                raw = json.load(f)
            self.state = {k: {int(p): int(e) for p, e in v.items()} for k, v in raw.items()}
        else:
            self.state = {"fact": {}, "dim": {}}

    def _stale_pids(self, fact_m: Manifest, dim_m: Manifest) -> list[int]:
        stale = set()
        for side, m in (("fact", fact_m), ("dim", dim_m)):
            seen = self.state[side]
            for pid, st in m.partitions.items():
                if int(st.lineage.get("epoch", -1)) > seen.get(pid, -1):
                    stale.add(pid)
        return sorted(stale)

    def refresh(
        self,
        fact_manifest: Manifest | None = None,
        dim_manifest: Manifest | None = None,
    ) -> list[int]:
        """Rewrite the view files of exactly the stale partitions; returns
        the refreshed partition ids (empty = the view was already fresh).

        Pass explicit manifests to refresh AT A SPECIFIC CUT — e.g. the
        manifests resolved through a ``MultiTableTask`` parent pointer, so
        the view only ever reflects atomically-committed multi-table
        epochs (a torn prepare is invisible by construction)."""
        fact_m = fact_manifest if fact_manifest is not None else self.fact.manifest
        dim_m = dim_manifest if dim_manifest is not None else self.dim.manifest
        stale = self._stale_pids(fact_m, dim_m)
        if not stale:
            return []
        f_plan = self.fact.committed_plan(fact_m)
        d_plan = self.dim.committed_plan(dim_m)
        f_plan_json, d_plan_json = f_plan.to_json(), d_plan.to_json()
        f_spec_json = self.fact.spec.to_json()
        d_spec_json = self.dim.spec.to_json()
        join_cols = self.join_cols
        out_dir = self.out_dir

        def part_item(m: Manifest, pid: int) -> tuple[list, list]:
            st = m.partitions.get(pid)
            return (list(st.files), st.versions()) if st else ([], [])

        items = []
        for pid in stale:
            ff, fv = part_item(fact_m, pid)
            df_, dv = part_item(dim_m, pid)
            items.append(
                {"pid": pid, "fact_files": ff, "fact_vers": fv,
                 "dim_files": df_, "dim_vers": dv}
            )

        def refresh_one(batch: pd.DataFrame) -> pa.Table:
            from tapdata_connectors_ray.stages.merge import lww_merge_tables

            fp = EvolutionPlan.from_json(f_plan_json, spec=TableSpec.from_json(f_spec_json))
            dp = EvolutionPlan.from_json(d_plan_json, spec=TableSpec.from_json(d_spec_json))
            f_schema = merged_schema(fp.schema_at())
            d_schema = merged_schema(dp.schema_at())
            rows = []
            for _, row in batch.iterrows():
                pid = int(row["pid"])
                fact_tabs = [
                    _lake_file_to_table(f, fp, int(v))
                    for f, v in zip(row["fact_files"], row["fact_vers"])
                ]
                merged_f = (
                    lww_merge_tables(fact_tabs, f_schema, fp.keys())
                    if fact_tabs
                    else f_schema.empty_table()
                )
                agg = merged_f.group_by(join_cols).aggregate(
                    [([], "count_all"), ("turn_score", "sum")]
                )
                agg = agg.rename_columns(
                    [
                        {"count_all": "n_turns", "turn_score_sum": "sum_score"}.get(c, c)
                        for c in agg.column_names
                    ]
                )
                dim_tabs = [
                    _lake_file_to_table(f, dp, int(v))
                    for f, v in zip(row["dim_files"], row["dim_vers"])
                ]
                merged_d = (
                    lww_merge_tables(dim_tabs, d_schema, dp.keys())
                    if dim_tabs
                    else d_schema.empty_table()
                )
                # attribute columns = the dim PAYLOAD schema minus the join
                # key (the merged lake table also carries engine columns —
                # lsn/op/partition_id — that must not leak into the view)
                dim_cols = [
                    f.name
                    for f in dp.schema_at()
                    if f.name not in join_cols and f.name in merged_d.column_names
                ]
                joined = agg.join(
                    merged_d.select(join_cols + dim_cols),
                    keys=join_cols,
                    join_type="left outer",
                )
                joined = joined.select(
                    join_cols + ["n_turns", "sum_score"] + dim_cols
                ).sort_by([(c, "ascending") for c in join_cols])
                atomic_put_parquet(joined, os.path.join(out_dir, f"p={pid:05d}.parquet"))
                # CASCADED rollup view: the per-channel partial of this
                # partition lands in the SAME task (zero extra passes over
                # the data) — the rollup's group key (a dim attribute) is
                # NOT the partition key, so its final fold happens at read
                # over partition-count-scale partials (two-level aggregate)
                if "channel" in joined.column_names:
                    part = joined.group_by(["channel"]).aggregate(
                        [([], "count_all"), ("sum_score", "sum")]
                    )
                    part = part.rename_columns(
                        [
                            {"count_all": "n_convs", "sum_score_sum": "score_part"}.get(
                                c, c
                            )
                            for c in part.column_names
                        ]
                    )
                    atomic_put_parquet(
                        part, os.path.join(out_dir, "rollup", f"p={pid:05d}.parquet")
                    )
                rows.append({"partition_id": pid})
            return pa.Table.from_pylist(rows)

        (
            ray.data.from_items(items)
            .map_batches(refresh_one, batch_format="pandas", batch_size=1)
            .take_all()
        )
        for side, m in (("fact", fact_m), ("dim", dim_m)):
            for pid in stale:
                st = m.partitions.get(pid)
                if st is not None:
                    self.state[side][pid] = int(st.lineage.get("epoch", -1))
        tmp = os.path.join(self.out_dir, self.STATE_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(self.state, f)
        os.replace(tmp, os.path.join(self.out_dir, self.STATE_FILE))
        return stale

    def dataset(self) -> ray.data.Dataset:
        files = sorted(
            os.path.join(self.out_dir, f)
            for f in os.listdir(self.out_dir)
            if f.endswith(".parquet")
        )
        return ray.data.read_parquet(files)

    def rollup(self) -> pd.DataFrame:
        """The cascaded per-channel rollup: final fold over the
        partition-count-scale partials the refresh tasks already wrote —
        metadata scale by construction (partitions × channels rows), never
        a pass over the data."""
        rdir = os.path.join(self.out_dir, "rollup")
        files = sorted(
            os.path.join(rdir, f) for f in os.listdir(rdir) if f.endswith(".parquet")
        )
        parts = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
        out = (
            parts.groupby("channel", dropna=False, sort=True)
            .agg(n_convs=("n_convs", "sum"), sum_score_total=("score_part", "sum"))
            .reset_index()
        )
        # the null-channel group must surface as a real None (the driver
        # hash distinguishes NaN from SQL NULL in object columns)
        out["channel"] = out["channel"].astype(object).where(out["channel"].notna(), None)
        out["n_convs"] = out["n_convs"].astype(np.int64)
        # an all-null-score channel sums to NaN; the oracle coalesces to 0
        out["sum_score_total"] = out["sum_score_total"].fillna(0).astype(np.int64)
        return out.sort_values("channel", na_position="last").reset_index(drop=True)

    def metrics(self) -> dict:
        """View freshness surface (north rule: per-partition lag metrics
        exported): per side, how many partitions are stale and the worst
        epoch lag (lake lineage epoch minus the view's refreshed epoch) —
        the number a staleness SLO monitor alerts on."""
        out: dict = {"partitions": 0, "stale_partitions": 0}
        for side, ing in (("fact", self.fact), ("dim", self.dim)):
            seen = self.state[side]
            lags = [
                int(st.lineage.get("epoch", -1)) - seen.get(pid, -1)
                for pid, st in ing.manifest.partitions.items()
                if st.files
            ]
            out[f"{side}_epoch_lag_max"] = max(lags) if lags else 0
            out[f"{side}_stale_partitions"] = sum(1 for l in lags if l > 0)
            out["partitions"] = max(out["partitions"], len(lags))
        out["stale_partitions"] = (
            out["fact_stale_partitions"] + out["dim_stale_partitions"]
        )
        return out
