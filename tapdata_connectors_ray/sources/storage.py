"""Pluggable file-storage backends for the file sources/sinks.

The reference routes every file connector through a storage SPI
(``file-storages/.../storage/*/...FileStorage.java`` — local, FTP, SFTP,
SMB, S3, OSS implementations of one list/open/write/delete surface) so the
CSV/XML/XLSX readers never touch ``java.io`` directly.  This module is that
SPI re-expressed for the Ray engine: a small protocol the segment scanners
and readers depend on, with

- :class:`LocalFileStorage` — the real os/filesystem backend, and
- :class:`MemoryFileStorage` — an in-memory mock with the same observable
  semantics (mtime advances on rewrite), standing in for the network
  backends the sandbox cannot reach.

Scale note: a ``MemoryFileStorage`` instance is plain data (dict of bytes),
so when a read routes through it the segment payloads ship to Ray tasks by
value — correct for the conformance-sized corpora it exists for, while
``LocalFileStorage`` keeps the zero-copy ``read_binary_files`` /
``read_csv`` path where Ray tasks open paths themselves.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Protocol, runtime_checkable


@dataclass(frozen=True)
class FileStat:
    """The listing attributes the offset map keys on (``TapFile`` analogue:
    path + last-modified + length)."""

    path: str
    mtime_ns: int
    size: int


@runtime_checkable
class FileStorage(Protocol):
    """list/read/write/delete — the surface every reference
    ``...FileStorage.java`` implements."""

    def list(
        self, src_dir: str, suffixes: tuple[str, ...], recursive: bool = False
    ) -> list[FileStat]: ...

    def read_bytes(self, path: str) -> bytes: ...

    def write_bytes(self, path: str, data: bytes) -> None: ...

    def exists(self, path: str) -> bool: ...

    def delete(self, path: str) -> None: ...

    def stat(self, path: str) -> FileStat: ...

    def move(self, src: str, dst: str) -> None: ...

    def atomic_put(self, path: str, data: bytes) -> None:
        """Replace ``path`` with ``data`` such that a reader never observes
        partial content (POSIX: tmp+fsync+rename; object store: PUT, atomic
        by contract)."""
        ...

    def put_if_absent(self, path: str, data: bytes) -> bool:
        """Create ``path`` only if it does not exist; True on success.  The
        mutual-exclusion primitive (POSIX ``O_EXCL``; object store:
        conditional put / If-None-Match)."""
        ...


class LocalFileStorage:
    """The os-backed storage every production path uses; paths are visible
    to Ray tasks, so bulk reads stay on ``ray.data.read_*`` (no bytes
    through the driver)."""

    def list(
        self, src_dir: str, suffixes: tuple[str, ...], recursive: bool = False
    ) -> list[FileStat]:
        names: list[str]
        if recursive:
            names = [
                os.path.relpath(os.path.join(root, f), src_dir)
                for root, _, fs in os.walk(src_dir)
                for f in fs
            ]
        else:
            names = [
                f for f in os.listdir(src_dir)
                if os.path.isfile(os.path.join(src_dir, f))
            ]
        out = []
        for f in sorted(names):
            if f.endswith(suffixes):
                p = os.path.join(src_dir, f)
                st = os.stat(p)
                out.append(FileStat(p, st.st_mtime_ns, st.st_size))
        return out

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        os.unlink(path)

    def stat(self, path: str) -> FileStat:
        st = os.stat(path)
        return FileStat(path, st.st_mtime_ns, st.st_size)

    def move(self, src: str, dst: str) -> None:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(src, dst)

    def atomic_put(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, data)
        finally:
            os.close(fd)
        return True


@dataclass
class MemoryFileStorage:
    """In-memory mock backend: the stand-in for the FTP/SFTP/SMB/S3/OSS
    storages (no network in the sandbox).  Observable contract matches
    LocalFileStorage — listings sort by path, a rewrite advances mtime —
    so the polling scanner's new/modified diff behaves identically."""

    files: dict[str, tuple[int, bytes]] = field(default_factory=dict)
    _clock: int = 0

    def list(
        self, src_dir: str, suffixes: tuple[str, ...], recursive: bool = False
    ) -> list[FileStat]:
        prefix = src_dir.rstrip("/") + "/"
        return [
            FileStat(p, mtime, len(data))
            for p, (mtime, data) in sorted(self.files.items())
            if p.startswith(prefix)
            and p.endswith(suffixes)
            and (recursive or "/" not in p[len(prefix):])
        ]

    def read_bytes(self, path: str) -> bytes:
        return self.files[path][1]

    def write_bytes(self, path: str, data: bytes) -> None:
        self._clock += 1
        self.files[path] = (self._clock, data)

    def exists(self, path: str) -> bool:
        return path in self.files

    def delete(self, path: str) -> None:
        del self.files[path]

    def stat(self, path: str) -> FileStat:
        mtime, data = self.files[path]
        return FileStat(path, mtime, len(data))

    def move(self, src: str, dst: str) -> None:
        # like a rename on a remote store: dst adopts a fresh mtime (the
        # polling scanner must see it as new at the destination)
        self._clock += 1
        self.files[dst] = (self._clock, self.files.pop(src)[1])

    def atomic_put(self, path: str, data: bytes) -> None:
        self.write_bytes(path, data)  # a single PUT is atomic by contract

    def put_if_absent(self, path: str, data: bytes) -> bool:
        if path in self.files:
            return False
        self.write_bytes(path, data)
        return True


LOCAL = LocalFileStorage()


def atomic_put_parquet(table, path: str, storage: FileStorage = LOCAL) -> None:
    """Atomic parquet write through the SPI: the LOCAL backend keeps the
    zero-extra-copy tmp+rename fast path workers use today; any other
    backend serializes to a buffer and relies on its atomic PUT.  This is
    the single write primitive of the lake/ledger writers, so swapping the
    backend swaps the commit mechanics everywhere at once."""
    import uuid

    import pyarrow.parquet as pq

    if isinstance(storage, LocalFileStorage):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    else:
        import io

        buf = io.BytesIO()
        pq.write_table(table, buf)
        storage.atomic_put(path, buf.getvalue())


def read_parquet_table(path: str, storage: FileStorage = LOCAL):
    """SPI twin of ``pq.read_table`` for the ledger folds' bucket files."""
    import pyarrow.parquet as pq

    if isinstance(storage, LocalFileStorage):
        return pq.read_table(path)
    import io

    return pq.read_table(io.BytesIO(storage.read_bytes(path)))
