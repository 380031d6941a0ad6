"""Every oracle_sql() string must BIND in DuckDB (EXPLAIN over the
registered testdata views at the smoke tier) — a seconds-scale safety net
against oracle syntax/path regressions that otherwise only the full gate
would catch.  No Ray involvement: this validates the SQL side only.
"""

import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_DIR = "/root/testdata/sf0.001"


def test_all_oracle_sql_binds(monkeypatch):
    monkeypatch.setenv("TCR_ORACLE_SF_DIR", SF_DIR)
    import __ray_entry__ as mod

    sqls = mod.oracle_sql()
    qs = mod.queries()
    assert set(sqls) == set(qs), "every query needs an oracle and vice versa"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failures = {}
    for name, sql in sqls.items():
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as ex:  # noqa: BLE001 - collecting all binder errors
            failures[name] = str(ex).splitlines()[0]
    assert not failures, failures
