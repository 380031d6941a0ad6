"""Checkpoint manifest: per-partition high-watermark LSN + file lineage.

The reference's offset objects (``MysqlStreamOffset``/``PostgresOffset``/
``CommonDbOffset``, survey §1.4) are persisted engine-side after every
consumed batch; sinks get idempotency from labels/commits (Doris per-batch
UUID label ``DorisStreamLoader.java:149-168``; Hudi startCommit/commit/
rollback ``HuDiWriteBySparkClient.java:210-268``).  Here both roles collapse
into ONE atomic artifact: a JSON manifest recording, per lake partition,

    {applied_lsn, files, rows, lineage:{min_lsn, max_lsn, event_rows, epoch}}

Commit protocol (the only externally-visible commit in the engine):
  1. workers write partition data files to their final names (epoch-stamped,
     deterministic -> a retried task overwrites with identical content);
  2. the driver writes ``manifest.json.tmp``, fsyncs, then atomically
     ``os.replace``s it over ``manifest.json``.
A crash before step 2 leaves the old manifest authoritative; orphan data
files are invisible (reads go through the manifest) and get overwritten by
the re-run.  Resume = load manifest, filter the log to
``lsn > applied_lsn[partition]`` per partition.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class PartitionState:
    applied_lsn: int = -1
    files: list[str] = field(default_factory=list)
    rows: int = 0
    schema_version: int = 1  # schema of the newest file / the committed plan
    # schema version EACH file was written under (parallel to ``files``) — a
    # delta stack can straddle DDL boundaries; empty = all at schema_version
    file_versions: list[int] = field(default_factory=list)
    lineage: dict = field(default_factory=dict)

    def versions(self) -> list[int]:
        if self.file_versions and len(self.file_versions) == len(self.files):
            return list(self.file_versions)
        return [self.schema_version] * len(self.files)


@dataclass
class Manifest:
    num_partitions: int
    epoch: int = 0
    schema_version: int = 1
    ddl_history: list = field(default_factory=list)  # EvolutionPlan.to_json()
    table_spec: dict | None = None  # TableSpec.to_json() — None = transcripts
    partitions: dict[int, PartitionState] = field(default_factory=dict)

    def watermarks(self) -> np.ndarray:
        """np.int64[num_partitions]: applied LSN per partition (-1 = empty)."""
        wm = np.full(self.num_partitions, -1, dtype=np.int64)
        for pid, st in self.partitions.items():
            wm[pid] = st.applied_lsn
        return wm

    def files_by_partition(self) -> dict[int, list[str]]:
        return {pid: list(st.files) for pid, st in self.partitions.items()}

    def all_files(self) -> list[str]:
        return [f for st in self.partitions.values() for f in st.files]

    def to_json(self) -> dict:
        return {
            "num_partitions": self.num_partitions,
            "epoch": self.epoch,
            "schema_version": self.schema_version,
            "ddl_history": self.ddl_history,
            "table_spec": self.table_spec,
            "partitions": {
                str(pid): {
                    "applied_lsn": st.applied_lsn,
                    "files": st.files,
                    "rows": st.rows,
                    "schema_version": st.schema_version,
                    "file_versions": st.file_versions,
                    "lineage": st.lineage,
                }
                for pid, st in self.partitions.items()
            },
        }

    @classmethod
    def from_json(cls, d: dict) -> "Manifest":
        m = cls(
            num_partitions=d["num_partitions"],
            epoch=d["epoch"],
            schema_version=d.get("schema_version", 1),
            ddl_history=list(d.get("ddl_history", [])),
            table_spec=d.get("table_spec"),
        )
        for pid, st in d.get("partitions", {}).items():
            m.partitions[int(pid)] = PartitionState(
                applied_lsn=st["applied_lsn"],
                files=list(st["files"]),
                rows=st["rows"],
                schema_version=st.get("schema_version", 1),
                file_versions=list(st.get("file_versions", [])),
                lineage=dict(st.get("lineage", {})),
            )
        return m


def manifest_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "manifest.json")


def load_manifest(lake_dir: str) -> Manifest | None:
    path = manifest_path(lake_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return Manifest.from_json(json.load(f))


class ManifestConflictError(RuntimeError):
    """Optimistic-concurrency fence: another writer committed since this
    writer loaded the manifest.  The loser must reload and re-derive (its
    data files are orphans — invisible, reads go through the manifest)."""


def commit_manifest(
    lake_dir: str, manifest: Manifest, expected_epoch: int | None = None
) -> None:
    """Atomic swap: tmp write + fsync + rename — the single commit point.

    ``expected_epoch`` arms the optimistic-concurrency fence (the
    lake-table conditional-put / Hudi instant-conflict analogue): the swap
    only lands if the on-disk manifest is still at that epoch, under a
    best-effort ``manifest.lock`` (O_EXCL) spanning check+swap so two
    same-box writers can't interleave.  On an object store this maps to a
    conditional put / ETag precondition.

    Every commit ALSO lands an immutable per-epoch snapshot under
    ``history/manifest-{epoch}.json`` — the time-travel index (the lake-table
    commit timeline: any epoch whose data files haven't been GC'd by a later
    compaction is readable as of that epoch)."""
    os.makedirs(lake_dir, exist_ok=True)
    path = manifest_path(lake_dir)
    lock_fd = None
    if expected_epoch is not None:
        import time

        lock = os.path.join(lake_dir, "manifest.lock")
        for attempt in range(2):
            for _ in range(200):  # ~2 s of 10 ms retries per acquire attempt
                try:
                    lock_fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    break
                except FileExistsError:
                    time.sleep(0.01)
            if lock_fd is not None or attempt == 1:
                break
            # a lock older than the full retry window is a crashed writer's
            # leftover: reclaim it so the fence self-heals instead of every
            # future commit waiting 2 s and running unfenced forever
            try:
                if time.time() - os.stat(lock).st_mtime >= 2.0:
                    os.unlink(lock)
            except FileNotFoundError:
                pass  # the holder released between the loop and the stat
        cur = load_manifest(lake_dir)
        if cur is not None and cur.epoch != expected_epoch:
            if lock_fd is not None:
                os.close(lock_fd)
                os.unlink(lock)
            raise ManifestConflictError(
                f"manifest moved to epoch {cur.epoch} (expected {expected_epoch}) "
                f"— another writer committed; reload and retry"
            )
    try:
        _write_manifest_files(lake_dir, path, manifest)
    finally:
        if lock_fd is not None:
            os.close(lock_fd)
            os.unlink(os.path.join(lake_dir, "manifest.lock"))


def _write_manifest_files(lake_dir: str, path: str, manifest: Manifest) -> None:
    payload = json.dumps(manifest.to_json(), indent=1)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    hist_dir = os.path.join(lake_dir, "history")
    os.makedirs(hist_dir, exist_ok=True)
    hist = os.path.join(hist_dir, f"manifest-{manifest.epoch:06d}.json")
    htmp = hist + ".tmp"
    with open(htmp, "w") as f:
        f.write(payload)
    os.replace(htmp, hist)


def load_manifest_at(lake_dir: str, epoch: int) -> Manifest | None:
    """The manifest as committed at ``epoch`` (time-travel read), or None if
    that epoch was never committed in this lake."""
    path = os.path.join(lake_dir, "history", f"manifest-{epoch:06d}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return Manifest.from_json(json.load(f))


def committed_epochs(lake_dir: str) -> list[int]:
    hist_dir = os.path.join(lake_dir, "history")
    if not os.path.isdir(hist_dir):
        return []
    out = []
    for n in os.listdir(hist_dir):
        if n.startswith("manifest-") and n.endswith(".json"):
            out.append(int(n[len("manifest-"):-len(".json")]))
    return sorted(out)


def partition_dir(lake_dir: str, pid: int) -> str:
    return os.path.join(lake_dir, "partitions", f"p={pid:05d}")
