"""File sources: CSV / JSONL segment directories with offset-resume and
polling tail.

The Ray-Data rebuild of the reference's file connectors
(``connectors-common/file-connector-core/.../FileConnector.java:113-189``,
``connectors/csv-connector/.../CsvConnector.java:110-235``): list -> sort ->
read files with a per-file offset map; stream mode polls the directory for
new/modified files and feeds only the delta.

Offsets here are segment-file granularity (path -> (mtime, size)) — the
natural unit for a lake ingest where writers produce immutable segment
files; the reference's per-line offsets exist because its files mutate
in-place.  A modified file (same path, new mtime/size) is re-read in full
and the downstream LSN/idempotent merge absorbs the replayed prefix — the
same recovery contract as the reference's resumable snapshot.

Reads are ``ray.data.read_csv`` / ``read_json`` over explicit file lists, so
Ray parallelizes per segment and the streaming executor handles
backpressure.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data


@dataclass
class FileSourceOffset:
    """Known-file map: path -> (mtime_ns, size). JSON round-trippable —
    the ``FileOffset`` analogue."""

    known: dict[str, tuple[int, int]] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps({k: list(v) for k, v in sorted(self.known.items())})

    @classmethod
    def from_json(cls, s: str) -> "FileSourceOffset":
        return cls({k: (int(a), int(b)) for k, (a, b) in json.loads(s).items()})


def _list_segments(src_dir: str, suffixes: tuple[str, ...]) -> list[str]:
    return sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(suffixes)
    )


def scan_new_files(
    src_dir: str,
    offset: FileSourceOffset | None = None,
    suffixes: tuple[str, ...] = (".csv", ".jsonl", ".json"),
) -> tuple[list[str], FileSourceOffset]:
    """One polling cycle: returns (new-or-modified files, advanced offset).
    The directory-diff core of the reference's 60 s polling stream."""
    offset = offset or FileSourceOffset()
    fresh: list[str] = []
    new_known = dict(offset.known)
    for path in _list_segments(src_dir, suffixes):
        st = os.stat(path)
        sig = (st.st_mtime_ns, st.st_size)
        if offset.known.get(path) != sig:
            fresh.append(path)
            new_known[path] = sig
    return fresh, FileSourceOffset(new_known)


def read_csv_segments(
    files: list[str], schema: pa.Schema | None = None
) -> ray.data.Dataset:
    """CSV segments -> Dataset (one read task per file; explicit schema
    disables sampling-based inference so segments can't drift apart)."""
    if not files:
        return ray.data.from_arrow(pa.table({}))
    kwargs = {}
    if schema is not None:
        kwargs["convert_options"] = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema}
        )
    return ray.data.read_csv(files, **kwargs)


def read_jsonl_segments(files: list[str]) -> ray.data.Dataset:
    if not files:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_json(files)


def batch_then_poll(
    src_dir: str,
    reader,
    offset: FileSourceOffset | None = None,
):
    """Batch phase + one stream poll (the ``batchRead`` -> ``streamRead``
    handoff): returns (dataset over the current delta, next offset).  A live
    tailer loops this under a timer; the replay harness calls it stepwise."""
    fresh, next_offset = scan_new_files(src_dir, offset)
    return reader(fresh), next_offset


# -- deterministic segment writers (test/fixture support) --------------------


def write_csv_segments(table: pa.Table, out_dir: str, rows_per_file: int = 8192) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(0, table.num_rows, rows_per_file):
        p = os.path.join(out_dir, f"seg-{i // rows_per_file:05d}.csv")
        pacsv.write_csv(table.slice(i, rows_per_file), p)
        paths.append(p)
    return paths


def write_jsonl_segments(table: pa.Table, out_dir: str, rows_per_file: int = 8192) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    cols = table.column_names
    for i in range(0, table.num_rows, rows_per_file):
        chunk = table.slice(i, rows_per_file).to_pylist()
        p = os.path.join(out_dir, f"seg-{i // rows_per_file:05d}.jsonl")
        with open(p, "w") as f:
            for row in chunk:
                f.write(json.dumps({c: row[c] for c in cols}, default=str) + "\n")
        paths.append(p)
    return paths
