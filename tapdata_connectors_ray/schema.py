"""Arrow schemas and the portable type lattice.

The reference models every table as a ``TapTable`` of ``TapField``s with a
portable type per column (reference: ``connectors-common/connector-core/.../
base/ConnectorBase.java:138-180``, survey §1.3).  Here a logical table IS a
``pyarrow.Schema``; the change-event stream (``TapInsertRecordEvent`` /
``TapUpdateRecordEvent`` / ``TapDeleteRecordEvent`` / ``TapDDLEvent``, survey
§1.1) is serialized as rows of a flat Arrow event-log table whose physical
schema is the superset of every schema version's columns.

Key design points:
- ``lsn`` is the ``exactlyOnceId`` analogue (reference:
  ``MysqlReader.java:851-854``, ``PostgresCdcRunner.java:260``): a strictly
  increasing, replay-stable log sequence number.  Last-writer-wins and
  idempotent dedup both key on it.
- ``op`` in {"I","U","D","DDL"} mirrors binlog ops c/u/d + DDL strings
  (reference: ``MysqlReader.java:634-735``).
- ``schema_ver`` records which schema version an event was emitted under, so
  a normalize stage can rewrite old-version rows to the latest schema
  (reference interleaves DDL events in-stream: ``MysqlReader.java:512-513``).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

# ---------------------------------------------------------------------------
# TableSpec: the TapTable analogue — every operator is parameterized by it
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TableSpec:
    """Logical table descriptor driving the whole engine, the Ray analogue of
    the reference's ``TapTable`` (assembled at ``CommonDbConnector.java:90-123``
    and threaded through every writer via ``NormalWriteRecorder.java:64-79``,
    which derives key/column lists per table at runtime).

    - ``base_schema``: the v1 payload schema; later versions are folded from
      DDL events by :class:`~tapdata_connectors_ray.state.registry.EvolutionPlan`.
    - ``key_columns``: the primary key.  ``None`` = no-PK fallback: ALL payload
      columns form the key with null-safe matching (reference:
      ``NormalWriteRecorder.java:64-79,365-376``).
    - ``partition_columns``: the shuffle/partitioning key — a prefix of (or
      equal to) the primary key so partitions stay key-disjoint.  Defaults to
      the full key; the transcripts table partitions by ``conv_id`` only so a
      conversation's turns stay co-located.
    """

    name: str
    base_schema: pa.Schema
    key_columns: tuple[str, ...] | None = None
    partition_columns: tuple[str, ...] | None = None

    def effective_keys(self, payload_schema: pa.Schema | None = None) -> list[str]:
        """Key columns; for no-PK tables, every payload column (evaluated
        against the CURRENT payload schema so DDL renames are respected)."""
        if self.key_columns is not None:
            return list(self.key_columns)
        return list((payload_schema or self.base_schema).names)

    def effective_partition_columns(
        self, payload_schema: pa.Schema | None = None
    ) -> list[str]:
        if self.partition_columns is not None:
            return list(self.partition_columns)
        return self.effective_keys(payload_schema)

    # -- manifest serialization (schema survives lake restarts) -------------

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "key_columns": list(self.key_columns) if self.key_columns else None,
            "partition_columns": (
                list(self.partition_columns) if self.partition_columns else None
            ),
            "base_schema": [[f.name, str(f.type)] for f in self.base_schema],
        }

    @classmethod
    def from_json(cls, data: dict) -> "TableSpec":
        return cls(
            name=data["name"],
            base_schema=pa.schema(
                [pa.field(n, _type_from_str(t)) for n, t in data["base_schema"]]
            ),
            key_columns=tuple(data["key_columns"]) if data["key_columns"] else None,
            partition_columns=(
                tuple(data["partition_columns"]) if data["partition_columns"] else None
            ),
        )


def _type_from_str(s: str) -> pa.DataType:
    """Inverse of ``str(pa.DataType)`` for the types a TableSpec can carry."""
    if s.startswith("timestamp"):
        # e.g. "timestamp[us]" or "timestamp[us, tz=UTC]"
        inner = s[s.index("[") + 1 : s.rindex("]")]
        parts = [p.strip() for p in inner.split(",")]
        tz = None
        for p in parts[1:]:
            if p.startswith("tz="):
                tz = p[3:]
        return pa.timestamp(parts[0], tz=tz)
    return pa.type_for_alias(s)


# ---------------------------------------------------------------------------
# Lake table key (transcripts north-star table)
# ---------------------------------------------------------------------------

KEY_COLUMNS = ("conv_id", "turn_idx")

# ---------------------------------------------------------------------------
# Schema versions of the transcripts lake table (fixture evolution cases,
# FIXTURES.md §3: ADD column -> RENAME column -> TYPE widen)
# ---------------------------------------------------------------------------

# v1: the base snapshot schema (input_hint shape + turn_score for the widen case)
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("turn_score", pa.int32()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# v5 (latest): after ADD tool_meta (v2, appended), RENAME tool->tool_name
# (v3, in place), WIDEN turn_score int32->int64 (v4, in place), DROP
# tool_meta (v5) — the order is exactly what folding the DDL deltas over the
# v1 schema produces
LATEST_TRANSCRIPTS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool_name", pa.string()),
        pa.field("turn_score", pa.int64()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Columns of the latest lake schema, in output order.
LATEST_COLUMNS = [f.name for f in LATEST_TRANSCRIPTS_SCHEMA]

# ---------------------------------------------------------------------------
# Physical event-log schema: superset of all versions' columns + event metadata
# ---------------------------------------------------------------------------

EVENT_LOG_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),  # I / U / D / DDL
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),        # pre-rename name (ver < 3)
        pa.field("tool_name", pa.string()),   # post-rename name (ver >= 3)
        pa.field("tool_meta", pa.string()),   # added at ver 2
        pa.field("turn_score", pa.int64()),   # physically int64; logical int32 until ver 4
        pa.field("ts", pa.timestamp("us")),
        pa.field("schema_ver", pa.int32()),
        pa.field("ddl_payload", pa.string()),  # JSON field-delta for op == "DDL"
        # before-image key of a key-changing update (MysqlReader.java:646-668
        # carries before+after); non-null ONLY when an update moves the row —
        # normalize expands it into tombstone@old-key + upsert@new-key
        pa.field("before_conv_id", pa.string()),
        pa.field("before_turn_idx", pa.int32()),
    ]
)

OPS = ("I", "U", "D", "DDL")

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "python", "browser", "calculator", "retrieval", None)

# The north-star table as a TableSpec; partitioned by conv_id only so a
# conversation's turns stay co-located (output order within a partition is
# (conv_id, turn_idx) without a global sort).
TRANSCRIPTS_SPEC = TableSpec(
    name="transcripts",
    base_schema=TRANSCRIPTS_SCHEMA,
    key_columns=KEY_COLUMNS,
    partition_columns=("conv_id",),
)
