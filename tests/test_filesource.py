"""File-source tests: segment listing/offset semantics + ingest parity."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest

from tapdata_connectors_ray.sources.files import (
    FileSourceOffset,
    read_csv_segments,
    scan_new_files,
    write_csv_segments,
)

SF = "/root/testdata/sf0.001"


def test_offset_roundtrip(tmp_path):
    t = pa.table({"a": list(range(100)), "b": ["x"] * 100})
    write_csv_segments(t, str(tmp_path), rows_per_file=30)
    files, off = scan_new_files(str(tmp_path))
    assert len(files) == 4
    # JSON round-trip (the persisted stateMap analogue)
    off2 = FileSourceOffset.from_json(off.to_json())
    fresh, _ = scan_new_files(str(tmp_path), off2)
    assert fresh == []


def test_poll_detects_new_and_modified(tmp_path):
    t = pa.table({"a": [1, 2, 3]})
    write_csv_segments(t, str(tmp_path))
    _, off = scan_new_files(str(tmp_path))
    # new file appears
    p_new = os.path.join(tmp_path, "seg-zzz.csv")
    with open(p_new, "w") as f:
        f.write("a\n9\n")
    fresh, off2 = scan_new_files(str(tmp_path), off)
    assert fresh == [p_new]
    # existing file modified (size change) -> re-read in full
    with open(p_new, "a") as f:
        f.write("10\n")
    fresh2, _ = scan_new_files(str(tmp_path), off2)
    assert fresh2 == [p_new]


def test_csv_ingest_matches_duckdb(ray_session, tmp_path):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"])
    write_csv_segments(t, str(tmp_path), rows_per_file=4096)
    files, _ = scan_new_files(str(tmp_path))
    schema = pa.schema([("user_id", pa.int64()), ("value", pa.float64())])
    ds = read_csv_segments(files, schema)
    got = ds.count()
    exp = duckdb.sql(f"SELECT count(*) FROM read_csv('{tmp_path}/*.csv')").fetchone()[0]
    assert got == exp == t.num_rows


def test_filesource_queries_match_oracle(ray_session):
    from tapdata_connectors_ray.pipelines.filesource import (
        filesource_oracle_sql,
        filesource_queries,
    )

    qs = filesource_queries()
    sqls = filesource_oracle_sql(SF)
    con = duckdb.connect()
    # the partitioned-log query returns the CDC final state (covered by the
    # driver-gate oracle); this test checks the event-agg shaped queries
    for name in ("source_csv_events_agg", "source_jsonl_resume"):
        fn = qs[name]
        got = fn(SF)
        exp = con.execute(sqls[name]).fetchdf()
        got = got.sort_values("event_type").reset_index(drop=True)
        exp = exp.sort_values("event_type").reset_index(drop=True)
        assert got["n"].tolist() == exp["n"].tolist(), name
        assert got["mn"].tolist() == exp["mn"].tolist(), name
        assert got["mx"].tolist() == exp["mx"].tolist(), name


def test_xml_xlsx_roundtrip(ray_session, tmp_path):
    """XML and XLSX segment writers/readers round-trip values exactly
    (floats via shortest-repr, nulls, XML-escapable strings)."""
    import pyarrow as pa

    from tapdata_connectors_ray.sources.files import (
        read_xlsx_segments,
        read_xml_segments,
        write_xlsx_segments,
        write_xml_segments,
    )

    schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()), ("value", pa.float64())]
    )
    t = pa.table(
        {
            "user_id": pa.array([1, 2, None, 4], pa.int64()),
            "event_type": pa.array(["a<b", 'q"&x', None, "plain"], pa.string()),
            "value": pa.array([0.1, -2.5e-7, 3.0, None], pa.float64()),
        },
        schema=schema,
    )
    for writer, reader, sub in (
        (write_xml_segments, read_xml_segments, "xml"),
        (write_xlsx_segments, read_xlsx_segments, "xlsx"),
    ):
        d = str(tmp_path / sub)
        files = writer(t, d, rows_per_file=3)
        assert len(files) == 2
        back = reader(files, schema).to_pandas()
        back = back.sort_values("value", na_position="last").reset_index(drop=True)
        exp = t.to_pandas().sort_values("value", na_position="last").reset_index(drop=True)
        assert back.equals(exp), sub
