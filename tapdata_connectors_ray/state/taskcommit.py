"""Cross-table atomic commit: ONE task-level manifest makes a multi-table
epoch all-or-nothing.

The reference wraps a multi-table write batch in a database transaction —
``connectors-common/sql-core/src/main/java/io/tapdata/common/
CommonDbConnector.java:737-757`` (begin/commit/rollback around the batch,
registered per-connector at ``MysqlConnector.java:252-254``) — and its
lake-sink analogue drives an explicit startCommit/commit/rollback lifecycle
(``HuDiWriteBySparkClient.java:210-268``).  Without it, a crash between two
tables' per-lake epoch commits leaves a torn cut: table A is at epoch e+1,
table B still at e, and no fence detects it.

Here the transaction is a **two-phase parent manifest** over the existing
per-lake commit machinery (``state/checkpoint.py``), using only the
FileStorage SPI primitives (``atomic_put`` / ``put_if_absent``), so the
protocol is object-store-portable:

  PREPARE   each table runs its epoch ingest with ``commit=False`` (data
            files land under deterministic epoch-stamped names; the lake's
            own ``manifest.json`` is NOT touched) and the resulting manifest
            is staged at ``<lake>/staged/manifest-{epoch:06d}.json`` via
            ``atomic_put`` — idempotent: a retried prepare overwrites the
            stage with identical content.
  COMMIT    the parent ``<task>/task_manifest.json`` — mapping each table to
            its (lake_dir, epoch) — is swapped atomically under the same
            optimistic-concurrency fence as a lake commit (``put_if_absent``
            lock + expected-epoch check).  THIS is the transaction's single
            commit point: before it, readers resolve every table at the old
            task epoch; after it, at the new one.
  FINALIZE  each staged manifest is promoted into its lake's own
            ``manifest.json`` (lazy + idempotent roll-forward: recovery on
            open re-promotes anything the crash skipped).  Finalize is an
            optimization for single-table readers — task-level readers never
            depend on it, they resolve through the parent pointer.

Crash matrix (each case pinned by ``tests/test_taskcommit.py``):
  * between two tables' PREPAREs — parent still at epoch e; staged files and
    data files of the torn epoch are unreachable (reads go through the
    parent); retry re-prepares idempotently and converges.
  * after COMMIT, before/during FINALIZE — the epoch is durable; recovery
    rolls the lakes forward from the staged manifests.
  * concurrent task writers — the parent CAS makes exactly one win
    (``TaskCommitConflict``); the loser's staged epoch is orphaned data that
    the winner's next prepare overwrites.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from tapdata_connectors_ray.state.checkpoint import (
    Manifest,
    commit_manifest,
    load_manifest,
)


class TaskCommitConflict(RuntimeError):
    """Another writer advanced the task manifest since this writer loaded it."""


class InjectedTaskCrash(RuntimeError):
    """Deterministic fault injection for the crash-matrix tests."""


@dataclass
class TablePointer:
    lake_dir: str
    epoch: int

    def to_json(self) -> dict:
        return {"lake_dir": self.lake_dir, "epoch": self.epoch}

    @classmethod
    def from_json(cls, d: dict) -> "TablePointer":
        return cls(lake_dir=d["lake_dir"], epoch=int(d["epoch"]))


@dataclass
class TaskManifest:
    task_epoch: int = 0
    tables: dict[str, TablePointer] = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "task_epoch": self.task_epoch,
            "tables": {n: p.to_json() for n, p in sorted(self.tables.items())},
        }

    @classmethod
    def from_json(cls, d: dict) -> "TaskManifest":
        return cls(
            task_epoch=int(d["task_epoch"]),
            tables={n: TablePointer.from_json(p) for n, p in d["tables"].items()},
        )


def task_manifest_path(task_dir: str) -> str:
    return os.path.join(task_dir, "task_manifest.json")


def load_task_manifest(task_dir: str, storage=None) -> TaskManifest | None:
    from tapdata_connectors_ray.sources.storage import LOCAL

    storage = storage or LOCAL
    path = task_manifest_path(task_dir)
    if not storage.exists(path):
        return None
    return TaskManifest.from_json(json.loads(storage.read_bytes(path)))


def _staged_path(lake_dir: str, epoch: int) -> str:
    return os.path.join(lake_dir, "staged", f"manifest-{epoch:06d}.json")


def _stage_manifest(lake_dir: str, manifest: Manifest, storage) -> str:
    path = _staged_path(lake_dir, manifest.epoch)
    storage.atomic_put(path, json.dumps(manifest.to_json(), indent=1).encode())
    return path


def _load_staged(lake_dir: str, epoch: int, storage) -> Manifest:
    return Manifest.from_json(
        json.loads(storage.read_bytes(_staged_path(lake_dir, epoch)))
    )


def commit_task_manifest(
    task_dir: str,
    manifest: TaskManifest,
    expected_epoch: int | None = None,
    storage=None,
) -> None:
    """Atomic parent swap — same lock+check+put fence as a lake commit
    (``checkpoint.commit_manifest``), lifted to the task level."""
    from tapdata_connectors_ray.sources.storage import LOCAL

    storage = storage or LOCAL
    os.makedirs(task_dir, exist_ok=True)
    path = task_manifest_path(task_dir)
    locked = False
    if expected_epoch is not None:
        lock = os.path.join(task_dir, "task_manifest.lock")
        for attempt in range(2):
            for _ in range(200):
                if storage.put_if_absent(lock, b""):
                    locked = True
                    break
                time.sleep(0.01)
            if locked or attempt == 1:
                break
            try:  # reclaim a crashed writer's stale lock (same policy as lakes)
                if time.time() - storage.stat(lock).mtime_ns / 1e9 >= 2.0:
                    storage.delete(lock)
            except (FileNotFoundError, KeyError):
                pass
        cur = load_task_manifest(task_dir, storage=storage)
        if cur is not None and cur.task_epoch != expected_epoch:
            if locked:
                storage.delete(lock)
            raise TaskCommitConflict(
                f"task manifest moved to epoch {cur.task_epoch} "
                f"(expected {expected_epoch}) — another writer committed"
            )
    try:
        payload = json.dumps(manifest.to_json(), indent=1).encode()
        storage.atomic_put(path, payload)
        storage.atomic_put(
            os.path.join(task_dir, "history", f"task-{manifest.task_epoch:06d}.json"),
            payload,
        )
    finally:
        if locked:
            storage.delete(os.path.join(task_dir, "task_manifest.lock"))


class MultiTableTask:
    """Driver-side coordinator for an atomic multi-table sync epoch.

    ``ingests``: name -> the table's ``CheckpointedIngest`` (each owning its
    lake dir).  Construction runs recovery: any staged epochs the parent
    already committed are rolled forward into their lakes.
    """

    def __init__(self, task_dir: str, ingests: dict, storage=None):
        from tapdata_connectors_ray.sources.storage import LOCAL

        self.task_dir = task_dir
        self.ingests = dict(ingests)
        self.storage = storage or LOCAL
        self.manifest = load_task_manifest(task_dir, storage=self.storage) or TaskManifest()
        self._roll_forward()

    # -- recovery ----------------------------------------------------------

    def _roll_forward(self) -> None:
        """Promote every parent-committed staged manifest whose lake is
        behind (idempotent; a no-op on a clean open)."""
        for name, ptr in self.manifest.tables.items():
            ing = self.ingests.get(name)
            if ing is None:
                continue
            cur = load_manifest(ptr.lake_dir, storage=self.storage)
            cur_epoch = cur.epoch if cur is not None else 0
            if cur_epoch < ptr.epoch:
                staged = _load_staged(ptr.lake_dir, ptr.epoch, self.storage)
                commit_manifest(
                    ptr.lake_dir, staged, expected_epoch=cur_epoch, storage=self.storage
                )
                ing.manifest = staged
                if staged.table_spec is not None:
                    # a never-finalized lake was opened spec-blind; the
                    # staged manifest's recorded spec is authoritative
                    from tapdata_connectors_ray.schema import TableSpec

                    ing.spec = TableSpec.from_json(staged.table_spec)
            elif cur is not None:
                ing.manifest = cur

    # -- the transaction ---------------------------------------------------

    def commit_epoch(
        self,
        ingest_kwargs: dict[str, dict],
        *,
        crash_after_prepare: str | None = None,
        crash_before_finalize: bool = False,
    ) -> TaskManifest:
        """One atomic epoch across every table in ``ingest_kwargs``
        (name -> kwargs for that table's ``CheckpointedIngest.ingest``;
        ``commit`` is forced to False — the parent owns the commit point).

        ``crash_after_prepare`` / ``crash_before_finalize`` inject
        deterministic crashes for the recovery tests."""
        staged: dict[str, Manifest] = {}
        for name in sorted(ingest_kwargs):
            ing = self.ingests[name]
            kw = dict(ingest_kwargs[name])
            kw["commit"] = False
            m = ing.ingest(**kw)
            _stage_manifest(ing.lake_dir, m, self.storage)
            staged[name] = m
            if crash_after_prepare == name:
                raise InjectedTaskCrash(f"crash after prepare of table {name!r}")

        new = TaskManifest(
            task_epoch=self.manifest.task_epoch + 1,
            tables=dict(self.manifest.tables),
        )
        for name, m in staged.items():
            new.tables[name] = TablePointer(
                lake_dir=self.ingests[name].lake_dir, epoch=m.epoch
            )
        commit_task_manifest(
            self.task_dir, new, expected_epoch=self.manifest.task_epoch,
            storage=self.storage,
        )
        self.manifest = new  # <- the epoch is durable from here on
        if crash_before_finalize:
            raise InjectedTaskCrash("crash between task commit and finalize")

        for name, m in staged.items():
            ing = self.ingests[name]
            commit_manifest(
                ing.lake_dir, m, expected_epoch=m.epoch - 1, storage=self.storage
            )
            ing.manifest = m
        return new

    # -- task-level reads (never depend on finalize) -------------------------

    def table_manifest(self, name: str) -> Manifest | None:
        ptr = self.manifest.tables.get(name)
        if ptr is None:
            return None
        return _load_staged(ptr.lake_dir, ptr.epoch, self.storage)

    def dataset(self, name: str):
        """The table's state at the task's committed cut — resolved through
        the parent pointer, so a torn prepare or unfinalized lake is
        invisible by construction."""
        m = self.table_manifest(name)
        return self.ingests[name].final_dataset(m)
