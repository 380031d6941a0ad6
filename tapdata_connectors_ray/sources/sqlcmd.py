"""Raw SQL command source — the reference's execute-a-query-on-the-source
surface (``connectors/*/...Connector.java`` `executeCommand` /
query-passthrough family) re-aimed at the lake.

The lake's "source engine" for ad-hoc SQL is DuckDB over the same parquet
the Ray pipelines read: the command runs INSIDE one Ray task (not on the
driver), streams its result out as record batches, and the caller gets a
normal ``ray.data.Dataset`` to continue with ``map_batches`` / joins /
sinks.  This is the escape hatch for relational shapes the operator
algebra doesn't cover (correlated subqueries, window-function one-offs),
NOT the scale path: the command itself executes single-node inside its
task, so keep it to pushed-down/aggregated result sets — the docstring
contract the reference's raw-command source shares (its SQL also runs on
one source connection).

Security note: the command string is user-supplied BY DESIGN (same trust
model as the reference's executeCommand); it can only read the parquet
paths explicitly registered in ``tables``.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

# one emitted block per this many rows — keeps a big result from landing as
# a single oversized object-store block
_BATCH_ROWS = 65_536


@ray.remote(num_returns="dynamic")
def _run_sql(sql: str, tables: dict[str, str | list[str]]):
    import duckdb

    con = duckdb.connect()
    try:
        for name, path in tables.items():
            paths = [path] if isinstance(path, str) else list(path)
            quoted = ", ".join("'" + p.replace("'", "''") + "'" for p in paths)
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet([{quoted}])"
            )
        reader = con.execute(sql).fetch_record_batch(_BATCH_ROWS)
        n = 0
        while True:
            try:
                yield pa.Table.from_batches([reader.read_next_batch()])
                n += 1
            except StopIteration:
                break
        if n == 0:  # empty result still carries the schema
            yield pa.Table.from_batches([], schema=reader.schema)
    finally:
        con.close()


def read_sql_command(
    sql: str, tables: dict[str, str | list[str]]
) -> ray.data.Dataset:
    """Execute ``sql`` over the registered parquet ``tables`` (name ->
    path(s)) inside a Ray task and return the result as a Dataset.  Result
    blocks stream straight into the object store (dynamic task returns) —
    the driver holds only the block refs, never the bytes."""
    refs = list(ray.get(_run_sql.remote(sql, tables)))
    return ray.data.from_arrow_refs(refs)
