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


def load_manifest(lake_dir: str, storage=None) -> Manifest | None:
    from tapdata_connectors_ray.sources.storage import LOCAL

    storage = storage or LOCAL
    path = manifest_path(lake_dir)
    if not storage.exists(path):
        return None
    return Manifest.from_json(json.loads(storage.read_bytes(path)))


class ManifestConflictError(RuntimeError):
    """Optimistic-concurrency fence: another writer committed since this
    writer loaded the manifest.  The loser must reload and re-derive (its
    data files are orphans — invisible, reads go through the manifest)."""


def commit_manifest(
    lake_dir: str,
    manifest: Manifest,
    expected_epoch: int | None = None,
    storage=None,
) -> None:
    """Atomic swap through the FileStorage SPI — the single commit point.

    ``expected_epoch`` arms the optimistic-concurrency fence (the
    lake-table conditional-put / Hudi instant-conflict analogue): the swap
    only lands if the stored manifest is still at that epoch, under a
    best-effort ``manifest.lock`` taken with ``storage.put_if_absent`` —
    O_EXCL on the local backend, a conditional put / If-None-Match on an
    object store — spanning check+swap so two writers can't interleave.
    The protocol therefore needs only atomic_put / put_if_absent / delete
    from the backend: no fsync, no POSIX rename semantics leak out of the
    SPI (``test_fencing_under_memory_storage`` pins this).

    Every commit ALSO lands an immutable per-epoch snapshot under
    ``history/manifest-{epoch}.json`` — the time-travel index (the lake-table
    commit timeline: any epoch whose data files haven't been GC'd by a later
    compaction is readable as of that epoch)."""
    from tapdata_connectors_ray.sources.storage import LOCAL

    storage = storage or LOCAL
    os.makedirs(lake_dir, exist_ok=True)
    path = manifest_path(lake_dir)
    locked = False
    if expected_epoch is not None:
        import time

        lock = os.path.join(lake_dir, "manifest.lock")
        for attempt in range(2):
            for _ in range(200):  # ~2 s of 10 ms retries per acquire attempt
                if storage.put_if_absent(lock, b""):
                    locked = True
                    break
                time.sleep(0.01)
            if locked or attempt == 1:
                break
            # a lock older than the full retry window is a crashed writer's
            # leftover: reclaim it so the fence self-heals instead of every
            # future commit waiting 2 s and running unfenced forever
            try:
                if time.time() - storage.stat(lock).mtime_ns / 1e9 >= 2.0:
                    storage.delete(lock)
            except (FileNotFoundError, KeyError):
                pass  # the holder released between the loop and the stat
        cur = load_manifest(lake_dir, storage=storage)
        if cur is not None and cur.epoch != expected_epoch:
            if locked:
                storage.delete(lock)
            raise ManifestConflictError(
                f"manifest moved to epoch {cur.epoch} (expected {expected_epoch}) "
                f"— another writer committed; reload and retry"
            )
    try:
        _write_manifest_files(lake_dir, path, manifest, storage)
    finally:
        if locked:
            storage.delete(os.path.join(lake_dir, "manifest.lock"))


def _write_manifest_files(lake_dir: str, path: str, manifest: Manifest, storage) -> None:
    payload = json.dumps(manifest.to_json(), indent=1).encode()
    storage.atomic_put(path, payload)
    hist = os.path.join(
        lake_dir, "history", f"manifest-{manifest.epoch:06d}.json"
    )
    storage.atomic_put(hist, payload)


def load_manifest_at(lake_dir: str, epoch: int, storage=None) -> Manifest | None:
    """The manifest as committed at ``epoch`` (time-travel read), or None if
    that epoch was never committed in this lake."""
    from tapdata_connectors_ray.sources.storage import LOCAL

    storage = storage or LOCAL
    path = os.path.join(lake_dir, "history", f"manifest-{epoch:06d}.json")
    if not storage.exists(path):
        return None
    return Manifest.from_json(json.loads(storage.read_bytes(path)))


def committed_epochs(lake_dir: str, storage=None) -> list[int]:
    from tapdata_connectors_ray.sources.storage import LOCAL

    storage = storage or LOCAL
    hist_dir = os.path.join(lake_dir, "history")
    if isinstance(storage, type(LOCAL)) and not os.path.isdir(hist_dir):
        return []
    out = []
    for st in storage.list(hist_dir, suffixes=(".json",)):
        n = os.path.basename(st.path)
        if n.startswith("manifest-"):
            out.append(int(n[len("manifest-"):-len(".json")]))
    return sorted(out)


def partition_dir(lake_dir: str, pid: int) -> str:
    return os.path.join(lake_dir, "partitions", f"p={pid:05d}")
