"""User-extension surface: plain-Python operator registry.

The reference's extension points are a Java SPI + JS plugin loaders (survey
§2.11).  The Ray-native equivalent is deliberately minimal: an extension is
a named callable over Arrow batches (or a callable class for stateful actor
stages), registered once and composed into any Dataset pipeline — no
classloaders, no plugin packaging.

    @register_transform("redact-emails")
    def redact(batch: pa.Table) -> pa.Table: ...

    ds = apply_transforms(ds, ["redact-emails", "my-scorer"])
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, Protocol

import pyarrow as pa
import ray.data


class BatchTransform(Protocol):
    def __call__(self, batch: pa.Table) -> pa.Table: ...


class Source(Protocol):
    """A source yields (dataset, next_offset) per poll — the batchRead /
    streamRead contract collapsed to one shape (see sources/files.py)."""

    def __call__(self, offset: Any | None) -> tuple[ray.data.Dataset, Any]: ...


class Sink(Protocol):
    """A sink consumes a dataset and returns commit metadata (the
    writeRecord -> WriteListResult contract; see pipelines/incremental.py)."""

    def __call__(self, ds: ray.data.Dataset) -> dict: ...


_TRANSFORMS: dict[str, Callable] = {}


def register_transform(name: str, *, stateful: bool = False):
    """Register a batch transform (function) or actor-pool stage (class)."""

    def deco(fn):
        if name in _TRANSFORMS:
            raise ValueError(f"transform {name!r} already registered")
        _TRANSFORMS[name] = (fn, stateful)
        return fn

    return deco


def get_transform(name: str):
    if name not in _TRANSFORMS:
        raise KeyError(
            f"unknown transform {name!r}; registered: {sorted(_TRANSFORMS)}"
        )
    return _TRANSFORMS[name]


def registered_transforms() -> list[str]:
    return sorted(_TRANSFORMS)


def apply_transforms(
    ds: ray.data.Dataset, names: list[str], concurrency=None
) -> ray.data.Dataset:
    """Compose registered transforms into the pipeline (order preserved).
    Stateful transforms become autoscaling actor pools."""
    for name in names:
        fn, stateful = get_transform(name)
        kwargs: dict = {"batch_format": "pyarrow", "zero_copy_batch": True}
        if stateful:
            kwargs["concurrency"] = concurrency or (1, 4)
            kwargs.pop("zero_copy_batch")
        ds = ds.map_batches(fn, **kwargs)
    return ds
