"""Schema registry: versioned schema evolution from DDL events.

The reference parses DDL strings from the log into typed field-delta events
(``TapNewFieldEvent`` / ``TapAlterFieldNameEvent`` / ... via
``connectors-common/sql-core/.../ddl/DDLFactory.java:63-88``) and re-applies
them on the target (``CommonDbConnector.java:445-488``).  Here a DDL event is
a JSON field-delta row in the event log; the registry folds them (in LSN
order) into an :class:`EvolutionPlan` that can rewrite any batch emitted
under an older ``schema_ver`` to the latest schema, fully vectorized:

- ``add_field``    -> column is null for rows older than the DDL's version
- ``rename_field`` -> value carried from the old column name for older rows
- ``widen_field``  -> safe upcast (e.g. int32 -> int64)
- ``drop_field``   -> column removed (older rows' values discarded)

For *replay* mode the event log is complete up front, so the plan is plain
data built once on the driver from a pruned DDL-only scan and shipped into
``map_batches`` tasks by closure capture (tiny, serialized once per task —
the broadcast pattern).  For *live-tail* mode the same fold logic backs the
:class:`SchemaRegistryActor` singleton, whose version counter lets writer
stages detect drift mid-stream (the analogue of the write-path structure
re-check, reference: ``TapEventCollector.java:182-198``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray

from tapdata_connectors_ray.schema import TRANSCRIPTS_SPEC, TableSpec

_WIDEN_OK = {
    ("int8", "int16"), ("int8", "int32"), ("int8", "int64"),
    ("int16", "int32"), ("int16", "int64"),
    ("int32", "int64"),
    ("float", "double"),
}


_KNOWN_DDL_KINDS = frozenset({"add_field", "rename_field", "widen_field", "drop_field"})


@dataclass(frozen=True)
class DDLChange:
    lsn: int
    version: int  # schema version AFTER this change
    kind: str     # add_field | rename_field | widen_field | drop_field | unknown
    payload: dict

    @classmethod
    def from_row(cls, lsn: int, version: int, ddl_payload: str) -> "DDLChange":
        """Parse one DDL log row.  Unparseable payloads, unrecognized kinds
        and unsafe type changes degrade to ``kind="unknown"`` — a schema
        no-op that is preserved in the history (and therefore surfaced by
        the schema-history query) instead of killing the replay, mirroring
        the reference's ``TapDDLUnknownEvent`` fallback
        (``DDLFactory.java:63-88``, ``MysqlReader.java:722-731``).

        Index lifecycle DDL (create/drop index — the reference's
        ``TapCreateIndexEvent`` surface, ``CommonDbConnector.java:400-443``)
        parses to the TYPED no-op ``kind="index"``: a columnar lake has no
        secondary indexes to build, but the event stays distinguishable in
        the history instead of being swallowed as "unknown"."""
        try:
            p = json.loads(ddl_payload)
            kind = p["kind"]
            if kind in ("create_index", "drop_index"):
                return cls(
                    lsn=lsn, version=version, kind="index",
                    payload={"action": kind, **{k: v for k, v in p.items() if k != "kind"}},
                )
            if kind not in _KNOWN_DDL_KINDS:
                raise ValueError(f"unrecognized DDL kind {kind!r}")
            if kind == "widen_field":
                pair = (p["from_type"], p["to_type"])
                if pair not in _WIDEN_OK:
                    raise ValueError(f"unsafe type change {pair}")
        except (ValueError, KeyError, TypeError) as exc:
            return cls(
                lsn=lsn, version=version, kind="unknown",
                payload={"raw": ddl_payload, "reason": str(exc)},
            )
        return cls(lsn=lsn, version=version, kind=kind, payload=p)


@dataclass
class EvolutionPlan:
    """Ordered DDL changes over a :class:`TableSpec`; knows how to rewrite
    old-version batches.  The spec makes the plan (and every stage that
    closes over it) table-generic — the TapTable-driven dispatch of
    ``CommonDbConnector.java:90-123``."""

    changes: list[DDLChange] = field(default_factory=list)
    base_version: int = 1
    spec: TableSpec = TRANSCRIPTS_SPEC

    @property
    def latest_version(self) -> int:
        return self.changes[-1].version if self.changes else self.base_version

    def version_at_lsn(self, lsn: int) -> int:
        """Schema version in effect at ``lsn`` (inclusive) — the version a
        snapshot taken at that point in the log is written under."""
        v = self.base_version
        for c in self.changes:
            if c.lsn <= lsn:
                v = c.version
        return v

    def truncated_at(self, lsn: int) -> "EvolutionPlan":
        """The plan as of ``lsn`` — only changes at-or-below it (an epoch /
        snapshot never sees future DDL)."""
        return EvolutionPlan(
            changes=[c for c in self.changes if c.lsn <= lsn],
            base_version=self.base_version,
            spec=self.spec,
        )

    def keys(self) -> list[str]:
        """Effective key columns under the LATEST payload schema (no-PK
        tables key on every payload column, null-safe)."""
        return self.spec.effective_keys(self.schema_at())

    def partition_columns(self) -> list[str]:
        return self.spec.effective_partition_columns(self.schema_at())

    def to_json(self) -> list[dict]:
        """Serializable DDL history — persisted with the checkpoint manifest
        (the analogue of Debezium schema history saved in the stateMap,
        ``MysqlReader.java:423-469``)."""
        return [
            {"lsn": c.lsn, "version": c.version, "kind": c.kind, "payload": c.payload}
            for c in self.changes
        ]

    @classmethod
    def from_json(
        cls, data: list[dict], base_version: int = 1, spec: TableSpec = TRANSCRIPTS_SPEC
    ) -> "EvolutionPlan":
        return cls(
            changes=[
                DDLChange(lsn=d["lsn"], version=d["version"], kind=d["kind"],
                          payload=dict(d["payload"]))
                for d in data
            ],
            base_version=base_version,
            spec=spec,
        )

    @classmethod
    def from_ddl_table(
        cls, ddl: pa.Table, base_version: int = 1, spec: TableSpec = TRANSCRIPTS_SPEC
    ) -> "EvolutionPlan":
        """Build from the op=="DDL" rows (columns: lsn, schema_ver, ddl_payload)."""
        rows = sorted(ddl.to_pylist(), key=lambda r: r["lsn"])
        seen: set[int] = set()
        changes = []
        for r in rows:
            if r["lsn"] in seen:  # duplicate-LSN replay of a DDL event: no-op
                continue
            seen.add(r["lsn"])
            changes.append(DDLChange.from_row(r["lsn"], r["schema_ver"], r["ddl_payload"]))
        return cls(changes=changes, base_version=base_version, spec=spec)

    def merged_with(self, other: "EvolutionPlan") -> "EvolutionPlan":
        """Union of two DDL histories (dedup by LSN, LSN-ordered) — used by
        live tail, where a poll wave's segments only contain that wave's DDL
        rows and the committed manifest holds the earlier history."""
        by_lsn = {c.lsn: c for c in self.changes}
        for c in other.changes:
            by_lsn.setdefault(c.lsn, c)
        return EvolutionPlan(
            changes=[by_lsn[k] for k in sorted(by_lsn)],
            base_version=self.base_version,
            spec=self.spec,
        )

    def schema_at(self, version: int | None = None) -> pa.Schema:
        """The logical lake payload schema at ``version`` (default: latest),
        obtained by folding the DDL deltas over the spec's base schema — the
        TapTable-after-ALTERs analogue (``CommonDbConnector.java:445-488``)."""
        if version is None:
            version = self.latest_version
        fields = list(self.spec.base_schema)
        for ch in self.changes:
            if ch.version > version:
                break
            if ch.kind == "add_field":
                fields.append(pa.field(ch.payload["name"], pa.type_for_alias(ch.payload["type"])))
            elif ch.kind == "rename_field":
                src, dst = ch.payload["from"], ch.payload["to"]
                fields = [pa.field(dst, f.type) if f.name == src else f for f in fields]
            elif ch.kind == "widen_field":
                name = ch.payload["name"]
                t = pa.type_for_alias(ch.payload["to_type"])
                fields = [pa.field(name, t) if f.name == name else f for f in fields]
            elif ch.kind == "drop_field":
                fields = [f for f in fields if f.name != ch.payload["name"]]
        return pa.schema(fields)

    def migrate_table(self, table: pa.Table, from_version: int) -> pa.Table:
        """Structurally migrate a whole table written under an older schema
        version to the current one (add -> null column, rename, widen cast).
        Used when merging/reading lake partition files that predate a DDL —
        the deferred form of the reference's target-side ALTER TABLE."""
        for ch in self.changes:
            if ch.version <= from_version:
                continue
            if ch.kind == "add_field":
                name = ch.payload["name"]
                if name not in table.column_names:
                    table = table.append_column(
                        name, pa.nulls(len(table), pa.type_for_alias(ch.payload["type"]))
                    )
            elif ch.kind == "rename_field":
                src, dst = ch.payload["from"], ch.payload["to"]
                if src in table.column_names:
                    table = table.rename_columns(
                        [dst if c == src else c for c in table.column_names]
                    )
            elif ch.kind == "widen_field":
                name = ch.payload["name"]
                if name in table.column_names:
                    idx = table.schema.get_field_index(name)
                    table = table.set_column(
                        idx, name,
                        table[name].cast(pa.type_for_alias(ch.payload["to_type"]), safe=True),
                    )
            elif ch.kind == "drop_field":
                name = ch.payload["name"]
                if name in table.column_names:
                    table = table.drop_columns([name])
        return table

    def rewrite_to_latest(self, batch: pa.Table, ver_col: str = "schema_ver") -> pa.Table:
        """Rewrite a mixed-version batch to the latest logical schema.

        Vectorized per change: the per-row ``schema_ver`` selects whether a
        row predates the change (null backfill / old-name carry) or not.
        Physical event-log columns are a superset of all versions, so every
        referenced column exists.
        """
        ver = batch[ver_col]
        # most batches sit entirely on one side of a DDL's LSN (versions are
        # contiguous in the log) — min/max lets each change short-circuit to
        # cheap column ops instead of a per-row if_else blend that copies the
        # wide string columns once per change
        ver_min = pc.min(ver).as_py()
        ver_max = pc.max(ver).as_py()
        for ch in self.changes:
            none_older = ver_min is not None and ver_min >= ch.version
            all_older = ver_max is not None and ver_max < ch.version
            if ch.kind == "add_field":
                name = ch.payload["name"]
                if none_older:
                    pass  # physical column already carries the values
                elif all_older:
                    batch = batch.set_column(
                        batch.schema.get_field_index(name), name,
                        pa.nulls(len(batch), batch[name].type),
                    )
                else:
                    older = pc.less(ver, ch.version)
                    col = pc.if_else(older, pa.nulls(len(batch), batch[name].type), batch[name])
                    batch = batch.set_column(batch.schema.get_field_index(name), name, col)
            elif ch.kind == "rename_field":
                src, dst = ch.payload["from"], ch.payload["to"]
                if none_older:
                    batch = batch.drop_columns([src])
                elif all_older:
                    batch = batch.set_column(
                        batch.schema.get_field_index(dst), dst, batch[src]
                    ).drop_columns([src])
                else:
                    older = pc.less(ver, ch.version)
                    col = pc.if_else(older, batch[src], batch[dst])
                    batch = batch.set_column(batch.schema.get_field_index(dst), dst, col)
                    batch = batch.drop_columns([src])
            elif ch.kind == "widen_field":
                name = ch.payload["name"]
                target = pa.type_for_alias(ch.payload["to_type"])
                col = batch[name].cast(target, safe=True)
                batch = batch.set_column(batch.schema.get_field_index(name), name, col)
            elif ch.kind == "drop_field":
                name = ch.payload["name"]
                if name in batch.column_names:
                    batch = batch.drop_columns([name])
            elif ch.kind in ("unknown", "index"):
                pass  # degraded / index-lifecycle DDL: history-only no-op
            else:
                raise ValueError(f"unknown DDL kind {ch.kind}")
        return batch


@ray.remote
class SchemaRegistryActor:
    """Named singleton for live-tail mode: holds the evolving plan; stages
    poll ``version()`` per batch and refetch the plan on drift."""

    def __init__(self, base_version: int = 1):
        self.plan = EvolutionPlan(base_version=base_version)

    def apply_ddl_rows(self, rows: list[dict]) -> int:
        seen = {c.lsn for c in self.plan.changes}
        for r in sorted(rows, key=lambda r: r["lsn"]):
            if r["lsn"] in seen:
                continue
            self.plan.changes.append(
                DDLChange.from_row(r["lsn"], r["schema_ver"], r["ddl_payload"])
            )
            seen.add(r["lsn"])
        return self.plan.latest_version

    def version(self) -> int:
        return self.plan.latest_version

    def get_plan(self) -> EvolutionPlan:
        return self.plan

