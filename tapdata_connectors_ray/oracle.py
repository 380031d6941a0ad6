"""Single-process reference reducer — the pytest ground truth.

A deliberately naive row-at-a-time reimplementation of the target-writer
semantics (reference: ordered apply with upsert policies,
``connectors-common/sql-core/.../dml/NormalRecordWriter.java:66-153`` and
``NormalWriteRecorder.java:194-357``), without any I/O or parallelism:

- apply events in LSN order to a dict keyed by ``(conv_id, turn_idx)``;
- duplicate LSNs (replays) are idempotent no-ops (the ``exactlyOnceId``
  dedup-ledger contract, survey §2.7);
- insert policy = ``update_on_exists`` (upsert), update policy =
  ``insert_on_nonexists`` — i.e. last-writer-wins by LSN, the ClickHouse
  ``ReplacingMergeTree``/version-column analogue the survey maps the merge
  rule onto (reference: ``ClickhouseConnector.java:265-287``);
- delete removes the key (tombstone);
- DDL events evolve the schema; older events' payloads are mapped to the
  latest schema (ADD -> null backfill, RENAME -> value carry-over, WIDEN ->
  safe cast, DROP -> value discarded), mirroring ``DDLFactory`` wrapper
  semantics (survey §2.3).

Used only at t1/t2 scale in tests; the engine under test must match this
reducer row-for-row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa

from tapdata_connectors_ray.schema import LATEST_COLUMNS, LATEST_TRANSCRIPTS_SCHEMA


@dataclass
class WriteCounters:
    """``WriteListResult`` analogue (reference: writer result counters,
    ``NormalRecordWriter.java:120-153``)."""

    inserted: int = 0
    modified: int = 0
    removed: int = 0
    skipped_duplicates: int = 0
    ddl_applied: int = 0

    def as_dict(self) -> dict[str, int]:
        return {
            "inserted": self.inserted,
            "modified": self.modified,
            "removed": self.removed,
            "skipped_duplicates": self.skipped_duplicates,
            "ddl_applied": self.ddl_applied,
        }


@dataclass
class OracleReducer:
    state: dict[tuple[str, int], dict] = field(default_factory=dict)
    applied_lsns: set[int] = field(default_factory=set)
    counters: WriteCounters = field(default_factory=WriteCounters)

    def apply_base(self, base: pa.Table) -> None:
        """Load the snapshot (LSN 0, schema v1)."""
        for row in base.to_pylist():
            key = (row["conv_id"], row["turn_idx"])
            self.state[key] = {
                "conv_id": row["conv_id"],
                "turn_idx": row["turn_idx"],
                "role": row["role"],
                "text": row["text"],
                "tool_name": row["tool"],  # v1 name 'tool' -> latest 'tool_name'
                "turn_score": None if row["turn_score"] is None else int(row["turn_score"]),
                "ts": row["ts"],
                "_lsn": 0,
            }
            self.counters.inserted += 1

    def apply_events(self, events: pa.Table) -> None:
        """Apply a change-event table in LSN order (file order may be disordered)."""
        rows = events.to_pylist()
        rows.sort(key=lambda r: r["lsn"])
        for row in rows:
            lsn = row["lsn"]
            if lsn in self.applied_lsns:
                # counters are defined over the EXPANDED event stream (a
                # key-moving update is tombstone + upsert), matching the
                # distributed counter and the SQL oracle
                is_move = (
                    row["op"] == "U"
                    and row.get("before_turn_idx") is not None
                    and (row["before_conv_id"], row["before_turn_idx"])
                    != (row["conv_id"], row["turn_idx"])
                )
                self.counters.skipped_duplicates += 2 if is_move else 1
                continue
            self.applied_lsns.add(lsn)
            op = row["op"]
            if op == "DDL":
                self.counters.ddl_applied += 1
                continue
            key = (row["conv_id"], row["turn_idx"])
            if op == "D":
                if self.state.pop(key, None) is not None:
                    self.counters.removed += 1
                continue
            # key-changing update: delete at the before-image key first
            # (MysqlReader.java:646-668 carries before+after); a before-image
            # equal to the after key is an ordinary update, not a move
            if op == "U" and row.get("before_turn_idx") is not None:
                before_key = (row["before_conv_id"], row["before_turn_idx"])
                if before_key != key and self.state.pop(before_key, None) is not None:
                    self.counters.removed += 1
            ver = row["schema_ver"]
            tool_name = row["tool_name"] if ver >= 3 else row["tool"]
            new = {
                "conv_id": row["conv_id"],
                "turn_idx": row["turn_idx"],
                "role": row["role"],
                "text": row["text"],
                "tool_name": tool_name,
                "turn_score": None if row["turn_score"] is None else int(row["turn_score"]),
                "ts": row["ts"],
                "_lsn": lsn,
            }
            if key in self.state:
                self.state[key] = new
                self.counters.modified += 1
            else:
                self.state[key] = new
                self.counters.inserted += 1

    def final_table(self) -> pa.Table:
        """Final lake state in the latest schema, sorted by (conv_id, turn_idx)."""
        rows = [
            {c: v[c] for c in LATEST_COLUMNS}
            for _, v in sorted(self.state.items())
        ]
        if not rows:
            return LATEST_TRANSCRIPTS_SCHEMA.empty_table()
        df = pd.DataFrame(rows)
        df["turn_score"] = df["turn_score"].astype("Int64")
        return pa.Table.from_pandas(df, schema=LATEST_TRANSCRIPTS_SCHEMA, preserve_index=False)


def expected_final_state(base: pa.Table, events: pa.Table) -> pa.Table:
    red = OracleReducer()
    red.apply_base(base)
    red.apply_events(events)
    return red.final_table()


def expected_counters(base: pa.Table, events: pa.Table) -> dict[str, int]:
    red = OracleReducer()
    red.apply_base(base)
    red.apply_events(events)
    return red.counters.as_dict()
