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

import pyarrow as pa

# ---------------------------------------------------------------------------
# Lake table key
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
    ]
)

OPS = ("I", "U", "D", "DDL")

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "python", "browser", "calculator", "retrieval", None)
