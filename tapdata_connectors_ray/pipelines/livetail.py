"""Live log tail: directory polling -> checkpointed epoch ingest.

The ``streamRead`` phase of the reference engine loop (survey §3.1 step 5:
Debezium poll thread -> consumer callback -> writeRecord) re-expressed for a
lake: a CDC writer lands immutable log-segment files; the tailer polls the
directory (the file connector's 60 s polling stream,
``FileConnector.java:146-189``), and each poll wave of new segments becomes
one checkpointed ingest epoch (offset commit cadence = poll cadence,
``MysqlReader.java:363-364``).

Crash safety: the file offset (known-segment map) is persisted NEXT TO the
lake manifest but is only advanced AFTER the manifest commit; a crash
between ingest and offset write re-ingests the wave, and the LSN watermark
dedup makes that a no-op (exactly-once, survey §2.7).
"""

from __future__ import annotations

import json
import os

import ray.data

from tapdata_connectors_ray.pipelines.incremental import CheckpointedIngest
from tapdata_connectors_ray.sources.files import FileSourceOffset, scan_new_files


class LogTailer:
    """Poll-driven incremental ingest of a growing segment directory."""

    def __init__(self, log_dir: str, lake_dir: str, num_partitions: int = 64):
        self.log_dir = log_dir
        self.lake_dir = lake_dir
        self.ingest = CheckpointedIngest(lake_dir, num_partitions=num_partitions)
        self.offset = self._load_offset()

    # -- offset persistence (FileOffset analogue) --------------------------

    def _offset_path(self) -> str:
        return os.path.join(self.lake_dir, "tail_offset.json")

    def _load_offset(self) -> FileSourceOffset:
        try:
            with open(self._offset_path()) as f:
                return FileSourceOffset.from_json(f.read())
        except (OSError, json.JSONDecodeError):
            return FileSourceOffset()

    def _save_offset(self, offset: FileSourceOffset) -> None:
        tmp = self._offset_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(offset.to_json())
        os.replace(tmp, self._offset_path())

    # -- polling loop ------------------------------------------------------

    def poll_once(self, base_path: str | list[str] | None = None) -> int:
        """One poll cycle: ingest new/modified segments as one epoch.
        Returns the number of fresh segments (0 = idle cycle)."""
        fresh, nxt = scan_new_files(self.log_dir, self.offset, suffixes=(".parquet",))
        if not fresh:
            return 0
        self.ingest.ingest(fresh, base_path, use_watermarks=False)
        # offset advances only after the manifest commit (see module doc)
        self._save_offset(nxt)
        self.offset = nxt
        return len(fresh)

    def run_until_idle(
        self, base_path: str | list[str] | None = None, max_cycles: int = 1000
    ) -> int:
        """Poll until a cycle finds nothing new (replay-mode convergence);
        a live deployment would instead sleep(poll_interval) between cycles."""
        total = 0
        for i in range(max_cycles):
            n = self.poll_once(base_path if total == 0 else None)
            if n == 0:
                break
            total += n
        return total

    def final_dataset(self) -> ray.data.Dataset:
        return self.ingest.final_dataset()
