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


def test_csv_dialect_options(ray_session, tmp_path):
    """Separator/quote/header/data-start/just-string knobs (the reference's
    CsvConfig surface) round-trip through the Arrow reader."""
    from tapdata_connectors_ray.sources.files import CsvReadOptions, read_csv_segments

    p = str(tmp_path / "d.csv")
    with open(p, "w") as f:
        f.write('a;b\n#;comment\n1;"x;y"\n2;q\n')
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    # header in file, data starts at line 3 (skip the comment row)
    got = read_csv_segments(
        [p], schema, options=CsvReadOptions(separator=";", data_start_line=3)
    ).to_pandas().sort_values("a").reset_index(drop=True)
    assert got["a"].tolist() == [1, 2]
    assert got["b"].tolist() == ["x;y", "q"]  # quoted separator survives
    # explicit header + headerless file region (skip the real header + comment)
    got2 = read_csv_segments(
        [p], schema,
        options=CsvReadOptions(separator=";", header=["a", "b"], data_start_line=3),
    ).to_pandas()
    assert got2["a"].tolist() == [1, 2]
    # just_string: every column reads as string
    got3 = read_csv_segments(
        [p], schema,
        options=CsvReadOptions(separator=";", data_start_line=3, just_string=True),
    ).to_pandas()
    assert got3["a"].tolist() == ["1", "2"]


def test_scan_include_exclude_recursive(tmp_path):
    from tapdata_connectors_ray.sources.storage import LOCAL

    (tmp_path / "sub").mkdir()
    for name in ("keep-1.csv", "keep-2.csv", "skip-1.csv", "sub/keep-3.csv"):
        (tmp_path / name).write_text("a\n1\n")
    files, _ = scan_new_files(str(tmp_path), include_regex=r"^keep-", suffixes=(".csv",))
    assert [os.path.basename(f) for f in files] == ["keep-1.csv", "keep-2.csv"]
    files, _ = scan_new_files(str(tmp_path), exclude_regex=r"skip", suffixes=(".csv",))
    assert [os.path.basename(f) for f in files] == ["keep-1.csv", "keep-2.csv"]
    files, _ = scan_new_files(
        str(tmp_path), include_regex=r"^keep-", suffixes=(".csv",), recursive=True
    )
    assert [os.path.basename(f) for f in files] == ["keep-1.csv", "keep-2.csv", "keep-3.csv"]
    # memory backend honours recursive the same way
    from tapdata_connectors_ray.sources.storage import MemoryFileStorage

    mem = MemoryFileStorage()
    mem.write_bytes("/m/a.csv", b"x")
    mem.write_bytes("/m/deep/b.csv", b"x")
    assert [s.path for s in mem.list("/m", (".csv",))] == ["/m/a.csv"]
    assert [s.path for s in mem.list("/m", (".csv",), recursive=True)] == [
        "/m/a.csv", "/m/deep/b.csv"
    ]


def test_offstandard_line_expression(ray_session, tmp_path):
    """The reference's OffStandardFilter escape hatch: a regex whose group(1)
    captures each field, applied per line."""
    from tapdata_connectors_ray.sources.files import read_offstandard_lines

    p = str(tmp_path / "weird.txt")
    with open(p, "w") as f:
        f.write('<<id=1>><<name=ann>>\n<<id=2>><<name=bob>>\nnoise line\n')
    got = (
        read_offstandard_lines([p], r"<<\w+=(\w+)>>", ["id", "name"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got["id"].tolist() == ["1", "2"]
    assert got["name"].tolist() == ["ann", "bob"]


def test_xlsx_multisheet_colrange_sparse(ray_session, tmp_path):
    """Reference ExcelConfig surface: sheetNum selection, first/lastColumn
    window, and Excel's sparse rows (cells placed by r="B2"-style refs)."""
    import zipfile

    import pandas as pd

    from tapdata_connectors_ray.sources import files as F
    from tapdata_connectors_ray.sources.files import read_xlsx_segments, write_xlsx_segments

    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    t = pa.table({"a": list(range(10)), "b": [f"s{i}" for i in range(10)]}, schema=schema)
    d = str(tmp_path / "multi")
    files = write_xlsx_segments(t, d, num_sheets=3)
    # all sheets (default) -> full table
    got = read_xlsx_segments(files, schema).to_pandas().sort_values("a")
    assert got["a"].tolist() == list(range(10))
    # sheet 1 only -> first ceil(10/3)=4 rows
    got1 = read_xlsx_segments(files, schema, sheets=[1]).to_pandas()
    assert got1["a"].tolist() == [0, 1, 2, 3]
    # sheets 2+3 -> the rest
    got23 = read_xlsx_segments(files, schema, sheets=[2, 3]).to_pandas().sort_values("a")
    assert got23["a"].tolist() == [4, 5, 6, 7, 8, 9]
    # column window: only column 1 (a) -> b reads as null
    gotw = read_xlsx_segments(files, schema, sheets=[1], col_range=(1, 1)).to_pandas()
    assert gotw["a"].tolist() == [0, 1, 2, 3] and gotw["b"].isna().all()
    # sparse row: cell b placed by r= ref with a omitted
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>b</t></is></c></row>'
        '<row r="2"><c r="B2" t="inlineStr"><is><t>only-b</t></is></c></row>'
        '<row r="3"><c r="A3"><v>5</v></c></row>'
        "</sheetData></worksheet>"
    )
    p = str(tmp_path / "sparse.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", F._XLSX_CT)
        z.writestr("_rels/.rels", F._XLSX_RELS)
        z.writestr("xl/workbook.xml", F._XLSX_WB)
        z.writestr("xl/_rels/workbook.xml.rels", F._XLSX_WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    gots = read_xlsx_segments([p], schema).to_pandas()
    assert gots["a"].tolist()[1] == 5 and pd.isna(gots["a"].tolist()[0])
    assert gots["b"].tolist()[0] == "only-b" and gots["b"].tolist()[1] is None


def test_json_array_and_object_files(ray_session, tmp_path):
    """jsonType surface of the reference json-connector: whole-file JSON
    array of rows, and object-of-rows (map values are the rows)."""
    import json as _json

    from tapdata_connectors_ray.sources.files import read_json_file_segments

    schema = pa.schema([("id", pa.int64()), ("name", pa.string())])
    rows = [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}]
    pa_file = str(tmp_path / "arr.json")
    with open(pa_file, "w") as f:
        _json.dump(rows, f)
    po_file = str(tmp_path / "obj.json")
    with open(po_file, "w") as f:
        _json.dump({"r1": rows[0], "r2": rows[1]}, f)
    ga = read_json_file_segments([pa_file], schema, "array").to_pandas().sort_values("id")
    go = read_json_file_segments([po_file], schema, "object").to_pandas().sort_values("id")
    assert ga["id"].tolist() == go["id"].tolist() == [1, 2]
    assert ga["name"].tolist() == go["name"].tolist() == ["x", "y"]
    with pytest.raises(ValueError):
        read_json_file_segments([pa_file], schema, "lines")


def test_storage_stat_and_move(tmp_path):
    """stat/move round the SPI surface (reference LocalFileStorage.getFile /
    move); a moved file re-appears as NEW at its destination to the scanner."""
    from tapdata_connectors_ray.sources.storage import LOCAL, MemoryFileStorage

    for store, base in ((LOCAL, str(tmp_path)), (MemoryFileStorage(), "/m")):
        store.write_bytes(f"{base}/in/x.csv", b"a\n1\n")
        st = store.stat(f"{base}/in/x.csv")
        assert st.size == 4 and st.path.endswith("/in/x.csv")
        store.move(f"{base}/in/x.csv", f"{base}/done/x.csv")
        assert not store.exists(f"{base}/in/x.csv")
        assert store.read_bytes(f"{base}/done/x.csv") == b"a\n1\n"
        fresh, _ = scan_new_files(f"{base}/done", suffixes=(".csv",), storage=store)
        assert [os.path.basename(p) for p in fresh] == ["x.csv"]


def test_discover_schema(tmp_path):
    """Sample-based structure inference (FileSchema.sampleEveryFileData):
    field union across segments, permissive type promotion."""
    from tapdata_connectors_ray.sources.files import CsvReadOptions, discover_schema

    (tmp_path / "a.csv").write_text("id,name\n1,x\n2,y\n")
    (tmp_path / "b.csv").write_text("id,name,score\n3,z,1.5\n")  # added column
    files = sorted(str(p) for p in tmp_path.glob("*.csv"))
    sch = discover_schema(files, "csv")
    assert sch.names == ["id", "name", "score"]
    assert pa.types.is_integer(sch.field("id").type)
    assert pa.types.is_string(sch.field("name").type)
    assert pa.types.is_floating(sch.field("score").type)
    # dialect-aware sampling
    (tmp_path / "t.tsv").write_text("a\tb\n1\tq\n")
    sch2 = discover_schema(
        [str(tmp_path / "t.tsv")], "csv", options=CsvReadOptions(separator="\t")
    )
    assert sch2.names == ["a", "b"]
    # jsonl
    (tmp_path / "j.jsonl").write_text('{"k": 1, "s": "v"}\n{"k": 2, "s": "w"}\n')
    sch3 = discover_schema([str(tmp_path / "j.jsonl")], "jsonl")
    assert sch3.names == ["k", "s"]
    with pytest.raises(ValueError):
        discover_schema(files, "xml")


def test_xml_record_path(ray_session, tmp_path):
    """XPath-style record selection (the reference xml-connector's XPath
    config): records nested below the root, fields from child elements with
    attributes as fallback."""
    from tapdata_connectors_ray.sources.files import read_xml_segments

    doc = """<?xml version="1.0"?>
<rss><channel>
  <title>feed</title>
  <item id="1"><name>first</name><score>2.5</score></item>
  <item id="2"><name>second</name><score>-1.0</score></item>
</channel></rss>"""
    p = str(tmp_path / "feed.xml")
    with open(p, "w") as f:
        f.write(doc)
    schema = pa.schema([("id", pa.int64()), ("name", pa.string()), ("score", pa.float64())])
    got = (
        read_xml_segments([p], schema, record_path="channel/item")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got["id"].tolist() == [1, 2]          # from attributes
    assert got["name"].tolist() == ["first", "second"]
    assert got["score"].tolist() == [2.5, -1.0]
    # .// descendant form works too
    got2 = read_xml_segments([p], schema, record_path=".//item").to_pandas()
    assert len(got2) == 2


def test_bulk_ndjson_payload_parity(tmp_path):
    """Payload-content check for the vectorized bulk writer: every line is
    valid JSON, the action/source interleave survives control characters in
    key values, nullable int64 payload columns don't float-widen, and
    timestamps render exactly like the row-wise str(datetime) path did."""
    import datetime
    import json

    from tapdata_connectors_ray.sources.files import write_bulk_ndjson_batch

    batch = pa.table(
        {
            "conv_id": pa.array(
                ['c"quote', "c\\back", "c\nnewline", "c\ttab", "plain", "del1"]
            ),
            "turn_idx": pa.array([0, 1, 2, 3, 4, 5], pa.int32()),
            "op": pa.array(["I", "U", "I", "U", "I", "D"]),
            "turn_score": pa.array([5, None, 7, None, 9, None], pa.int64()),
            "ts": pa.array(
                [
                    datetime.datetime(2026, 1, 2, 3, 4, 5, 123000),
                    datetime.datetime(2026, 1, 2),
                    None,
                    datetime.datetime(2026, 1, 2, 3, 4, 5, 1),
                    datetime.datetime(2026, 1, 2),
                    None,
                ],
                pa.timestamp("us"),
            ),
        }
    )
    writer = write_bulk_ndjson_batch(str(tmp_path), "idx", ["conv_id", "turn_idx"])
    manifest = writer(batch)
    assert manifest["n_index"][0].as_py() == 5
    assert manifest["n_delete"][0].as_py() == 1
    with open(manifest["file"][0].as_py()) as f:
        lines = f.read().splitlines()
    assert len(lines) == 6 + 5  # one action line per event + source per upsert
    # every line parses standalone -> control chars were escaped, not raw
    parsed = [json.loads(ln) for ln in lines]
    # interleave: walk actions, collect sources
    docs = []
    i = 0
    actions = []
    while i < len(parsed):
        action = next(iter(parsed[i]))
        actions.append((action, parsed[i][action]["_id"]))
        i += 1
        if action == "index":
            docs.append(parsed[i])
            i += 1
    assert [a for a, _ in actions] == ["index"] * 5 + ["delete"]
    assert [i_ for _, i_ in actions] == [
        'c"quote:0', "c\\back:1", "c\nnewline:2", "c\ttab:3", "plain:4", "del1:5"
    ]
    # row-wise reference payloads (the old to_pylist/json.dumps semantics)
    ref = []
    for row in batch.to_pylist():
        if row["op"] == "D":
            continue
        ref.append(
            {
                k: (str(v) if isinstance(v, datetime.datetime) else v)
                for k, v in row.items()
            }
        )
    assert docs == ref


def test_write_topic_dataset_routing_and_envelope(ray_session, tmp_path):
    """Distributed producer sink: per-key routing is consistent (one key ->
    one partition), the MqOp envelope tags every row, and segment names
    embed the min LSN for append-order listing."""
    import ray.data

    from tapdata_connectors_ray.sources.partitioned_log import (
        poll_topic,
        read_topic_segments,
        write_topic_dataset,
    )

    t = pa.table(
        {
            "conv_id": pa.array([f"c{i % 7}" for i in range(200)]),
            "lsn": pa.array(list(range(200)), pa.int64()),
            "op": pa.array((["I", "U", "D", "U"] * 50)[:200]),
        }
    )
    topic = str(tmp_path / "topic")
    manifest = (
        write_topic_dataset(
            ray.data.from_arrow(t), topic, "conv_id", n_partitions=4,
            rows_per_segment=32,
        )
        .to_pandas()
    )
    assert manifest["rows"].sum() == 200
    files, _ = poll_topic(topic)
    back = read_topic_segments(files).to_pandas()
    assert len(back) == 200
    assert set(back["mq_op"]) == {"insert", "update", "delete"}
    assert (back["mq_op"] == "delete").sum() == (t["op"].to_pandas() == "D").sum()
    # one partition per key
    part_of = {}
    for f in files:
        pid = int(f.split("partition=")[1].split("/")[0])
        seg = read_topic_segments([f]).to_pandas()
        for k in seg["conv_id"].unique():
            part_of.setdefault(k, set()).add(pid)
    assert all(len(v) == 1 for v in part_of.values()), "key split across partitions"
    # min-LSN segment naming: listing order within a partition tracks lsn
    names = [os.path.basename(f) for f in files]
    assert all(n.startswith("seg-") and n.split("-")[1].isdigit() for n in names)


def test_topic_consumer_offset_resume_across_waves(ray_session, tmp_path):
    """Consumer contract across producer waves: a poll after the first wave
    returns only that wave's segments; the next wave's poll returns ONLY the
    new segments (per-partition offset map advanced); a third poll returns
    nothing."""
    import ray.data

    from tapdata_connectors_ray.sources.partitioned_log import (
        poll_topic,
        read_topic_segments,
        write_topic_dataset,
    )

    def feed(lo, hi):
        return ray.data.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([f"c{i % 5}" for i in range(lo, hi)]),
                    "lsn": pa.array(list(range(lo, hi)), pa.int64()),
                    "op": pa.array(["I"] * (hi - lo)),
                }
            )
        )

    topic = str(tmp_path / "t")
    write_topic_dataset(feed(0, 100), topic, "conv_id", n_partitions=4).materialize()
    files1, off1 = poll_topic(topic)
    assert read_topic_segments(files1).count() == 100
    write_topic_dataset(feed(100, 150), topic, "conv_id", n_partitions=4).materialize()
    files2, off2 = poll_topic(topic, off1)
    got2 = read_topic_segments(files2).to_pandas()
    assert len(got2) == 50 and got2["lsn"].min() == 100
    files3, _ = poll_topic(topic, off2)
    assert files3 == []


def test_bulk_payload_roundtrip_matches_oracle_and_cleans_up(
    ray_session, monkeypatch, smoke_fixture_dir
):
    """Payload half of the bulk-sink round-trip at the smoke tier: per-op
    aggregates of the parsed-back source documents equal the change log's
    (the oracle SQL), and the corpus-scale NDJSON dump is removed — both
    bulk-sink queries must leave nothing under /tmp (advisor finding r4)."""
    import glob

    from tapdata_connectors_ray.pipelines.filesource import (
        filesource_oracle_sql,
        q_sink_bulk_ndjson_payload,
    )

    monkeypatch.setenv("TCR_ORACLE_SF_DIR", SF)
    before = set(glob.glob("/tmp/bulk_sink_*"))
    sql = filesource_oracle_sql(SF)["sink_bulk_ndjson_payload"]
    got = (
        q_sink_bulk_ndjson_payload(SF).sort_values("op").reset_index(drop=True)
    )
    exp = duckdb.sql(sql).df().sort_values("op").reset_index(drop=True)
    assert got["op"].tolist() == exp["op"].tolist()
    for c in ("n", "sum_lsn", "sum_turn_idx", "sum_text_chars"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert set(glob.glob("/tmp/bulk_sink_*")) == before
