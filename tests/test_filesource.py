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


def test_memory_storage_scan_semantics():
    """Mock backend honours the same new/modified diff contract as the
    local dir (rewrite advances mtime -> file re-listed)."""
    from tapdata_connectors_ray.sources.storage import MemoryFileStorage

    mem = MemoryFileStorage()
    mem.write_bytes("/mock/d/a.csv", b"a\n1\n")
    mem.write_bytes("/mock/d/b.csv", b"a\n2\n")
    mem.write_bytes("/mock/other/c.csv", b"a\n3\n")  # outside src_dir
    files, off = scan_new_files("/mock/d", suffixes=(".csv",), storage=mem)
    assert files == ["/mock/d/a.csv", "/mock/d/b.csv"]
    fresh, off2 = scan_new_files("/mock/d", off, suffixes=(".csv",), storage=mem)
    assert fresh == []
    mem.write_bytes("/mock/d/a.csv", b"a\n1\n9\n")  # rewrite -> modified
    fresh, _ = scan_new_files("/mock/d", off2, suffixes=(".csv",), storage=mem)
    assert fresh == ["/mock/d/a.csv"]
    # offset survives the persisted-stateMap JSON round trip here too
    assert FileSourceOffset.from_json(off.to_json()).known == off.known


def test_storage_backends_agree(ray_session, tmp_path):
    """Same table written through the local and mock backends reads back
    identically — the backend is invisible in the values."""
    from tapdata_connectors_ray.sources.files import (
        read_csv_segment_bytes,
        write_csv_segment_bytes,
    )
    from tapdata_connectors_ray.sources.storage import LOCAL, MemoryFileStorage

    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    t = pa.table({"a": list(range(50)), "b": [f"s{i}" for i in range(50)]}, schema=schema)
    mem = MemoryFileStorage()
    write_csv_segment_bytes(t, str(tmp_path / "loc"), storage=LOCAL, rows_per_file=16)
    write_csv_segment_bytes(t, "/mock/seg", storage=mem, rows_per_file=16)
    loc_files, _ = scan_new_files(str(tmp_path / "loc"), suffixes=(".csv",))
    mem_files, _ = scan_new_files("/mock/seg", suffixes=(".csv",), storage=mem)
    assert len(loc_files) == len(mem_files) == 4
    a = read_csv_segment_bytes(loc_files, schema).to_pandas().sort_values("a").reset_index(drop=True)
    b = read_csv_segment_bytes(mem_files, schema, storage=mem).to_pandas().sort_values("a").reset_index(drop=True)
    assert a.equals(b)
    assert a["a"].tolist() == list(range(50))


def test_xlsx_shared_strings(ray_session, tmp_path):
    """Excel/POI-style files keep strings in xl/sharedStrings.xml with
    t="s" index cells (incl. rich-text runs) — the reader must handle both
    that and our writer's inline-string subset."""
    import zipfile

    from tapdata_connectors_ray.sources import files as F
    from tapdata_connectors_ray.sources.files import read_xlsx_segments

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row><c t="s"><v>0</v></c><c t="s"><v>1</v></c></row>'      # header via shared strings
        '<row><c><v>7</v></c><c t="s"><v>2</v></c></row>'
        '<row><c><v>8</v></c><c t="s"><v>3</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">'
        "<si><t>a</t></si><si><t>b</t></si>"
        "<si><t>plain</t></si>"
        "<si><r><t>rich </t></r><r><t>text</t></r></si>"             # rich-text runs concatenate
        "</sst>"
    )
    p = str(tmp_path / "shared.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", F._XLSX_CT)
        z.writestr("_rels/.rels", F._XLSX_RELS)
        z.writestr("xl/workbook.xml", F._XLSX_WB)
        z.writestr("xl/_rels/workbook.xml.rels", F._XLSX_WB_RELS)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    got = read_xlsx_segments([p], schema).to_pandas().sort_values("a").reset_index(drop=True)
    assert got["a"].tolist() == [7, 8]
    assert got["b"].tolist() == ["plain", "rich text"]
