"""File sources: CSV / JSONL segment directories with offset-resume and
polling tail.

The Ray-Data rebuild of the reference's file connectors
(``connectors-common/file-connector-core/.../FileConnector.java:113-189``,
``connectors/csv-connector/.../CsvConnector.java:110-235``): list -> sort ->
read files with a per-file offset map; stream mode polls the directory for
new/modified files and feeds only the delta.

Offsets here are segment-file granularity (path -> (mtime, size)) — the
natural unit for a lake ingest where writers produce immutable segment
files; the reference's per-line offsets exist because its files mutate
in-place.  A modified file (same path, new mtime/size) is re-read in full
and the downstream LSN/idempotent merge absorbs the replayed prefix — the
same recovery contract as the reference's resumable snapshot.

Reads are ``ray.data.read_csv`` / ``read_json`` over explicit file lists, so
Ray parallelizes per segment and the streaming executor handles
backpressure.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data

from tapdata_connectors_ray.sources.storage import (
    LOCAL,
    FileStorage,
    LocalFileStorage,
)


@dataclass
class FileSourceOffset:
    """Known-file map: path -> (mtime_ns, size). JSON round-trippable —
    the ``FileOffset`` analogue."""

    known: dict[str, tuple[int, int]] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps({k: list(v) for k, v in sorted(self.known.items())})

    @classmethod
    def from_json(cls, s: str) -> "FileSourceOffset":
        return cls({k: (int(a), int(b)) for k, (a, b) in json.loads(s).items()})


def scan_new_files(
    src_dir: str,
    offset: FileSourceOffset | None = None,
    suffixes: tuple[str, ...] = (".csv", ".jsonl", ".json"),
    storage: FileStorage = LOCAL,
    include_regex: str | None = None,
    exclude_regex: str | None = None,
    recursive: bool = False,
) -> tuple[list[str], FileSourceOffset]:
    """One polling cycle: returns (new-or-modified files, advanced offset).
    The directory-diff core of the reference's 60 s polling stream, over any
    :class:`FileStorage` backend (local dir, or the mock network backend).

    ``include_regex`` / ``exclude_regex`` filter on the file NAME (the
    reference's ``includeRegString`` / ``excludeRegString``,
    ``FileConfig.java``); exclude wins over include."""
    import re

    offset = offset or FileSourceOffset()
    inc = re.compile(include_regex) if include_regex else None
    exc = re.compile(exclude_regex) if exclude_regex else None
    fresh: list[str] = []
    new_known = dict(offset.known)
    for st in storage.list(src_dir, suffixes, recursive=recursive):
        name = os.path.basename(st.path)
        if inc is not None and not inc.search(name):
            continue
        if exc is not None and exc.search(name):
            continue
        sig = (st.mtime_ns, st.size)
        if offset.known.get(st.path) != sig:
            fresh.append(st.path)
            new_known[st.path] = sig
    return fresh, FileSourceOffset(new_known)


def read_segment_bytes(files: list[str], storage: FileStorage = LOCAL) -> ray.data.Dataset:
    """Segment files -> Dataset of ``{path, bytes}``.  Local backend keeps
    the parallel zero-driver ``read_binary_files`` path (tasks open the
    paths themselves); a non-local backend ships each segment's bytes by
    value — the conformance-scale path for the mock network storages."""
    if not files:
        return ray.data.from_arrow(
            pa.table({"path": pa.array([], pa.string()), "bytes": pa.array([], pa.binary())})
        )
    if isinstance(storage, LocalFileStorage):
        return ray.data.read_binary_files(files, include_paths=True)
    return ray.data.from_arrow(
        pa.table(
            {
                "path": pa.array(files, pa.string()),
                "bytes": pa.array([storage.read_bytes(p) for p in files], pa.binary()),
            }
        )
    )


def read_csv_segment_bytes(
    files: list[str], schema: pa.Schema, storage: FileStorage = LOCAL
) -> ray.data.Dataset:
    """CSV segments -> Dataset via the storage SPI: bytes from any backend,
    parsed with the Arrow CSV reader inside ``map_batches`` (the path the
    mock network storages use; local dirs prefer :func:`read_csv_segments`)."""
    import io

    column_types = {f.name: f.type for f in schema}  # ConvertOptions isn't picklable

    def parse(batch: pa.Table) -> pa.Table:
        opts = pacsv.ConvertOptions(column_types=column_types)
        tables = [
            pacsv.read_csv(io.BytesIO(blob), convert_options=opts)
            for blob in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables) if tables else schema.empty_table()

    return read_segment_bytes(files, storage).map_batches(
        parse, batch_format="pyarrow", batch_size=4
    )


def write_csv_segment_bytes(
    table: pa.Table,
    out_dir: str,
    storage: FileStorage = LOCAL,
    rows_per_file: int = 8192,
) -> list[str]:
    """CSV segment writer routed through the storage SPI (the sink half of
    the reference's file-storage write path)."""
    import io

    paths = []
    for i in range(0, table.num_rows, rows_per_file):
        buf = io.BytesIO()
        pacsv.write_csv(table.slice(i, rows_per_file), buf)
        p = f"{out_dir.rstrip('/')}/seg-{i // rows_per_file:05d}.csv"
        storage.write_bytes(p, buf.getvalue())
        paths.append(p)
    return paths


@dataclass(frozen=True)
class CsvReadOptions:
    """CSV dialect surface (the reference's ``CsvConfig`` + ``FileConfig``
    knobs: separator/quoteChar/fileEncoding/headerLine/header/dataStartLine/
    justString, ``config/CsvConfig.java``) mapped onto the Arrow CSV reader.

    ``header`` (explicit column names) takes precedence over the file's
    header line; ``data_start_line`` is 1-based like the reference (rows
    before it — beyond the header — are skipped); ``just_string`` reads
    every column as string (the reference's untyped mode)."""

    separator: str = ","
    quote_char: str | bool = '"'
    encoding: str = "utf8"
    header: list[str] | None = None
    data_start_line: int = 2  # 1-based first data row (reference default: after header)
    just_string: bool = False

    def arrow_args(self, schema: pa.Schema | None) -> dict:
        read_kwargs: dict = {"encoding": self.encoding}
        if self.header is not None:
            read_kwargs["column_names"] = list(self.header)
            # no header line in the file: data starts at line data_start_line-1 rows in
            read_kwargs["skip_rows"] = self.data_start_line - 1
        else:
            read_kwargs["skip_rows_after_names"] = self.data_start_line - 2
        out = {
            "read_options": pacsv.ReadOptions(**read_kwargs),
            "parse_options": pacsv.ParseOptions(
                delimiter=self.separator, quote_char=self.quote_char
            ),
        }
        if self.just_string and schema is not None:
            schema = pa.schema([pa.field(f.name, pa.string()) for f in schema])
        if schema is not None:
            out["convert_options"] = pacsv.ConvertOptions(
                column_types={f.name: f.type for f in schema}
            )
        return out


def read_csv_segments(
    files: list[str],
    schema: pa.Schema | None = None,
    options: CsvReadOptions | None = None,
) -> ray.data.Dataset:
    """CSV segments -> Dataset (one read task per file; explicit schema
    disables sampling-based inference so segments can't drift apart;
    ``options`` carries the dialect — separator/quote/encoding/header
    placement, reference ``CsvConnector.java:110-235``)."""
    if not files:
        return ray.data.from_arrow(pa.table({}))
    if options is not None:
        return ray.data.read_csv(files, **options.arrow_args(schema))
    kwargs = {}
    if schema is not None:
        kwargs["convert_options"] = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema}
        )
    return ray.data.read_csv(files, **kwargs)


def read_offstandard_lines(
    files: list[str],
    line_expression: str,
    columns: list[str],
    storage: FileStorage = LOCAL,
    encoding: str = "utf-8",
) -> ray.data.Dataset:
    """Off-standard "CSV": each line is decoded by repeatedly matching
    ``line_expression`` and taking group(1) — the reference's escape hatch
    for exports no dialect setting can describe (``OffStandardFilter.java``,
    ``OffStandardCsvSchema.java``).  Inherently regex-per-line; the pattern
    compiles once per task and all columns come back as strings (the
    reference's justString contract for this mode)."""
    import re

    if not files:
        return ray.data.from_arrow(
            pa.schema([(c, pa.string()) for c in columns]).empty_table()
        )
    pat = re.compile(line_expression)

    def parse(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {c: [] for c in columns}
        for blob in batch["bytes"].to_pylist():
            for line in blob.decode(encoding).splitlines():
                if not line:
                    continue
                vals = [m.group(1) for m in pat.finditer(line)]
                if not vals:
                    continue  # unmatched line -> skipped, like the reference's null return
                for i, c in enumerate(columns):
                    cols[c].append(vals[i] if i < len(vals) else None)
        return pa.table({c: pa.array(cols[c], pa.string()) for c in columns})

    return read_segment_bytes(files, storage).map_batches(
        parse, batch_format="pyarrow", batch_size=4
    )


def read_jsonl_segments(files: list[str]) -> ray.data.Dataset:
    if not files:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_json(files)


def read_json_file_segments(
    files: list[str],
    schema: pa.Schema,
    json_type: str = "array",
    storage: FileStorage = LOCAL,
) -> ray.data.Dataset:
    """Whole-file JSON documents -> Dataset — the reference json-connector's
    ``jsonType`` surface (``JsonConnector.java`` / ``JsonReaderUtil.java``):

    - ``"array"``:  the file is one JSON array of row objects;
    - ``"object"``: the file is one JSON object whose VALUES are the row
      objects (map keys are identifiers, discarded like the reference).

    (Line-delimited JSON stays on the zero-copy ``read_jsonl_segments``
    path.)  One parse task per file via ``read_segment_bytes``."""
    if json_type not in ("array", "object"):
        raise ValueError(f"json_type must be 'array' or 'object', got {json_type!r}")

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for blob in batch["bytes"].to_pylist():
            doc = json.loads(blob)
            rows.extend(doc.values() if isinstance(doc, dict) else doc)
        cols = {
            f.name: pa.array([r.get(f.name) for r in rows], type=f.type)
            for f in schema
        }
        return pa.table(cols)

    return read_segment_bytes(files, storage).map_batches(
        parse, batch_format="pyarrow", batch_size=4
    )


def batch_then_poll(
    src_dir: str,
    reader,
    offset: FileSourceOffset | None = None,
):
    """Batch phase + one stream poll (the ``batchRead`` -> ``streamRead``
    handoff): returns (dataset over the current delta, next offset).  A live
    tailer loops this under a timer; the replay harness calls it stepwise."""
    fresh, next_offset = scan_new_files(src_dir, offset)
    return reader(fresh), next_offset


def discover_schema(
    files: list[str],
    fmt: str = "csv",
    options: "CsvReadOptions | None" = None,
    storage: FileStorage = LOCAL,
    sample_files: int = 4,
) -> pa.Schema:
    """Sample-based schema discovery over segment files — the reference's
    ``FileSchema.sampleEveryFileData`` (``CsvSchema.java`` / ``JsonSchema.java``:
    read a sample, union the observed fields, infer types) on Arrow's
    inference kernels.  Samples the first ``sample_files`` segments, merges
    field sets (later files may carry added columns), and widens conflicting
    primitive types via Arrow's unify-promote rules."""
    import io as _io

    import pyarrow.json as pajson

    schemas: list[pa.Schema] = []
    for path in files[:sample_files]:
        blob = storage.read_bytes(path)
        if fmt == "csv":
            args = (options or CsvReadOptions()).arrow_args(None)
            t = pacsv.read_csv(_io.BytesIO(blob), **args)
        elif fmt in ("jsonl", "json"):
            t = pajson.read_json(_io.BytesIO(blob))
        else:
            raise ValueError(f"discover_schema: unsupported format {fmt!r}")
        schemas.append(t.schema)
    if not schemas:
        return pa.schema([])
    return pa.unify_schemas(schemas, promote_options="permissive")


# -- deterministic segment writers (test/fixture support) --------------------


def write_csv_segments(table: pa.Table, out_dir: str, rows_per_file: int = 8192) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(0, table.num_rows, rows_per_file):
        p = os.path.join(out_dir, f"seg-{i // rows_per_file:05d}.csv")
        pacsv.write_csv(table.slice(i, rows_per_file), p)
        paths.append(p)
    return paths


def write_jsonl_segments(table: pa.Table, out_dir: str, rows_per_file: int = 8192) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    cols = table.column_names
    for i in range(0, table.num_rows, rows_per_file):
        chunk = table.slice(i, rows_per_file).to_pylist()
        p = os.path.join(out_dir, f"seg-{i // rows_per_file:05d}.jsonl")
        with open(p, "w") as f:
            for row in chunk:
                f.write(json.dumps({c: row[c] for c in cols}, default=str) + "\n")
        paths.append(p)
    return paths


# -- XML segments (stdlib ElementTree; the reference's xml-connector surface) -


def write_xml_segments(table: pa.Table, out_dir: str, rows_per_file: int = 8192) -> list[str]:
    """<records><r><col>value</col>...</r>...</records> per segment.  Floats
    are written with ``repr`` (shortest round-trip), so parsed values are
    bit-identical to the source column."""
    import xml.etree.ElementTree as ET

    os.makedirs(out_dir, exist_ok=True)
    cols = table.column_names
    paths = []
    for i in range(0, table.num_rows, rows_per_file):
        chunk = table.slice(i, rows_per_file).to_pylist()
        root = ET.Element("records")
        for row in chunk:
            r = ET.SubElement(root, "r")
            for c in cols:
                v = row[c]
                el = ET.SubElement(r, c)
                if v is not None:
                    el.text = repr(v) if isinstance(v, float) else str(v)
        p = os.path.join(out_dir, f"seg-{i // rows_per_file:05d}.xml")
        ET.ElementTree(root).write(p, encoding="utf-8", xml_declaration=True)
        paths.append(p)
    return paths


def _cast_cell(text: str | None, t: pa.DataType):
    if text is None:
        return None
    if pa.types.is_integer(t):
        return int(text)
    if pa.types.is_floating(t):
        return float(text)
    return text


def read_xml_segments(
    files: list[str], schema: pa.Schema, record_path: str | None = None
) -> ray.data.Dataset:
    """XML segment files -> Dataset: ``read_binary_files`` (one task per
    file) + a parse stage emitting typed Arrow columns.  ElementTree's C
    parser handles the per-file decode; no per-row Python beyond the element
    walk (XML gives no columnar access).

    ``record_path`` selects the record elements — the reference
    xml-connector's ``XPath`` config (``XmlConfig.java``,
    ``BigSaxDataHandler.java``: records live at a configured element path).
    ElementTree path syntax relative to the root, e.g. ``"channel/item"`` or
    ``".//entry"``; default = the root's direct children (our writer's
    ``<records><r>`` layout).  Fields come from child-element text; record
    ATTRIBUTES fill fields child elements don't provide."""
    if not files:
        return ray.data.from_arrow(schema.empty_table())

    def parse(batch: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET

        cols: dict[str, list] = {f.name: [] for f in schema}
        for blob in batch["bytes"].to_pylist():
            root = ET.fromstring(blob)
            records = root.findall(record_path) if record_path else list(root)
            for r in records:
                cell = dict(r.attrib)
                cell.update({el.tag: el.text for el in r})
                for f in schema:
                    cols[f.name].append(_cast_cell(cell.get(f.name), f.type))
        return pa.table(
            {f.name: pa.array(cols[f.name], type=f.type) for f in schema}
        )

    return ray.data.read_binary_files(files).map_batches(
        parse, batch_format="pyarrow", batch_size=4
    )


# -- XLSX segments (a .xlsx IS a zip of XML parts; stdlib zipfile+ET gives a
#    real reader/writer for the inline-string subset — no POI/openpyxl) ------

_XLSX_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_XLSX_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_XLSX_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="data" sheetId="1" r:id="rId1"/></sheets></workbook>"""

_XLSX_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _sheet_xml(chunk: list[dict], cols: list[str]) -> str:
    from xml.sax.saxutils import escape

    rows_xml = ["<row>"]
    rows_xml += [f'<c t="inlineStr"><is><t>{escape(c)}</t></is></c>' for c in cols]
    rows_xml.append("</row>")
    for row in chunk:
        rows_xml.append("<row>")
        for c in cols:
            v = row[c]
            if v is None:
                rows_xml.append("<c/>")
            elif isinstance(v, (int, float)) and not isinstance(v, bool):
                rows_xml.append(f"<c><v>{repr(v) if isinstance(v, float) else v}</v></c>")
            else:
                rows_xml.append(f'<c t="inlineStr"><is><t>{escape(str(v))}</t></is></c>')
        rows_xml.append("</row>")
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(rows_xml) + "</sheetData></worksheet>"
    )


def write_xlsx_segments(
    table: pa.Table, out_dir: str, rows_per_file: int = 8192, num_sheets: int = 1
) -> list[str]:
    """Minimal OOXML writer: header row + data rows, strings inline
    (``t="inlineStr"``), numbers as shortest-round-trip text.
    ``num_sheets`` splits each segment's rows contiguously across that many
    worksheets (each repeating the header) — the multi-sheet workbook shape
    the reference's sheet selector targets."""
    import zipfile

    os.makedirs(out_dir, exist_ok=True)
    cols = table.column_names
    paths = []
    for i in range(0, table.num_rows, rows_per_file):
        chunk = table.slice(i, rows_per_file).to_pylist()
        per = -(-len(chunk) // num_sheets) if chunk else 1
        p = os.path.join(out_dir, f"seg-{i // rows_per_file:05d}.xlsx")
        with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("[Content_Types].xml", _XLSX_CT)
            z.writestr("_rels/.rels", _XLSX_RELS)
            z.writestr("xl/workbook.xml", _XLSX_WB)
            z.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
            for s in range(num_sheets):
                z.writestr(
                    f"xl/worksheets/sheet{s + 1}.xml",
                    _sheet_xml(chunk[s * per : (s + 1) * per], cols),
                )
        paths.append(p)
    return paths


def _col_index_from_ref(ref: str) -> int | None:
    """'B7' -> 1 (0-based column).  Excel omits empty cells and instead
    stamps each <c> with its position — positional zip misaligns there."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1 if n else None


def read_xlsx_segments(
    files: list[str],
    schema: pa.Schema,
    sheets: list[int] | None = None,
    col_range: tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """XLSX segment files -> Dataset (header row maps cells to columns by
    name).  Handles the string encodings real files use — inline strings
    (``t="inlineStr"``), the shared-strings table (``t="s"`` indexing
    ``xl/sharedStrings.xml``, what Excel/POI write), plain numeric ``<v>``
    cells — and sparse rows via the cell ``r`` position attribute.

    ``sheets`` selects 1-based worksheet numbers (the reference's
    ``sheetNum``/``sheetLocation``, ``ExcelConfig.java``; default = all
    sheets, each expected to repeat the header).  ``col_range`` is a 1-based
    inclusive positional column window (``firstColumn``/``lastColumn``)."""
    if not files:
        return ray.data.from_arrow(schema.empty_table())

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

    def _cell_text(cell, shared: list[str]) -> str | None:
        t = cell.get("t")
        if t == "inlineStr":
            return cell.findtext(f"{NS}is/{NS}t")
        v = cell.findtext(f"{NS}v")
        if t == "s" and v is not None:
            return shared[int(v)]
        return v

    def _row_cells(row, shared: list[str]) -> dict[int, str | None]:
        out: dict[int, str | None] = {}
        pos = 0
        for cell in row.findall(f"{NS}c"):
            idx = _col_index_from_ref(cell.get("r", ""))
            pos = idx if idx is not None else pos
            out[pos] = _cell_text(cell, shared)
            pos += 1
        if col_range is not None:
            lo, hi = col_range[0] - 1, col_range[1] - 1
            out = {i: v for i, v in out.items() if lo <= i <= hi}
        return out

    def parse(batch: pa.Table) -> pa.Table:
        import io
        import re
        import xml.etree.ElementTree as ET
        import zipfile

        cols: dict[str, list] = {f.name: [] for f in schema}
        for blob in batch["bytes"].to_pylist():
            with zipfile.ZipFile(io.BytesIO(blob)) as z:
                nums = sorted(
                    int(m.group(1))
                    for n in z.namelist()
                    if (m := re.fullmatch(r"xl/worksheets/sheet(\d+)\.xml", n))
                )
                chosen = [n for n in nums if sheets is None or n in sheets]
                sheet_blobs = [z.read(f"xl/worksheets/sheet{n}.xml") for n in chosen]
                shared: list[str] = []
                if "xl/sharedStrings.xml" in z.namelist():
                    sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
                    # an <si> is one shared string: plain <t>, or rich-text
                    # runs (<r><t>..</t></r>...) that concatenate
                    shared = [
                        "".join(t.text or "" for t in si.iter(f"{NS}t"))
                        for si in sroot.findall(f"{NS}si")
                    ]
            for sheet in sheet_blobs:
                root = ET.fromstring(sheet)
                rows = root.find(f"{NS}sheetData").findall(f"{NS}row")
                if not rows:
                    continue
                header = _row_cells(rows[0], shared)
                for row in rows[1:]:
                    vals = {
                        header.get(i): v
                        for i, v in _row_cells(row, shared).items()
                        if header.get(i) is not None
                    }
                    for f in schema:
                        cols[f.name].append(_cast_cell(vals.get(f.name), f.type))
        return pa.table(
            {f.name: pa.array(cols[f.name], type=f.type) for f in schema}
        )

    return ray.data.read_binary_files(files).map_batches(
        parse, batch_format="pyarrow", batch_size=4
    )


# -- bulk-operation sink (the Elasticsearch _bulk NDJSON format) --------------


def write_bulk_ndjson_batch(out_dir: str, index_name: str, key_cols: list[str]):
    """map_batches sink stage: normalized change events -> one ES-style
    ``_bulk`` NDJSON segment per batch (action line + source line for
    upserts, action-only for deletes — ``ElasticsearchRecordWriter.java:74+``
    re-expressed as a file sink; each task writes its own segment, so the
    sink parallelizes with the stream and nothing funnels through the
    driver).  Emits one manifest row per segment."""
    import uuid as _uuid

    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        # fully vectorized NDJSON assembly: ids by string concat, action
        # lines by template concat (per-row json.dumps only for ids that
        # actually need JSON escaping — candidate-scale), source lines via
        # pandas' C-speed to_json, interleaved positionally
        import numpy as np

        df = batch.to_pandas()
        # nullable int64 payload columns arrive as float64 after to_pandas
        # (5 -> 5.0 in the JSON); cast back to pandas Int64 so to_json emits
        # integers, and render timestamps exactly like str(datetime) did in
        # the row-wise path (no ISO "T", microseconds only when non-zero)
        for field in batch.schema:
            if pa.types.is_integer(field.type) and df[field.name].dtype == "float64":
                df[field.name] = df[field.name].astype("Int64")
            elif pa.types.is_timestamp(field.type):
                mask = df[field.name].notna()
                df[field.name] = (
                    df[field.name]
                    .dt.strftime("%Y-%m-%d %H:%M:%S.%f")
                    .str.replace(r"\.000000$", "", regex=True)
                    .where(mask)
                )
        n = len(df)
        ids = df[key_cols[0]].astype(str)
        for k in key_cols[1:]:
            ids = ids + ":" + df[k].astype(str)
        # JSON-escape ids containing quotes, backslashes OR the control
        # characters JSON forbids raw (\n, \t, ...) — a raw newline in an
        # _id would split the action line and misalign the interleave
        esc = ids.str.contains("[\\\\\"\\x00-\\x1f]", regex=True)
        if esc.any():
            ids = ids.where(
                ~esc, ids[esc].map(lambda s: json.dumps(s)[1:-1])
            )
        is_del = (df["op"] == "D").to_numpy()
        act = np.where(
            is_del,
            ('{"delete": {"_index": "' + index_name + '", "_id": "' + ids + '"}}').to_numpy(),
            ('{"index": {"_index": "' + index_name + '", "_id": "' + ids + '"}}').to_numpy(),
        )
        src = df[~is_del].to_json(orient="records", lines=True, date_format="iso")
        src_lines = src.splitlines() if src else []
        n_index = int((~is_del).sum())
        n_delete = n - n_index
        out = np.empty(n + n_index, object)
        before = np.cumsum(~is_del) - ~is_del  # non-delete rows before row i
        start = np.arange(n) + before
        out[start] = act
        out[start[~is_del] + 1] = src_lines
        lines = out.tolist()
        path = os.path.join(out_dir, f"bulk-{_uuid.uuid4().hex}.ndjson")
        with open(path, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        return pa.table(
            {
                "file": pa.array([path], pa.string()),
                "n_index": pa.array([n_index], pa.int64()),
                "n_delete": pa.array([n_delete], pa.int64()),
            }
        )

    return write


def read_bulk_action_counts(files: list[str]) -> ray.data.Dataset:
    """Parse bulk NDJSON segments back: (action, n) partials per file —
    the read-back half of the sink round-trip check."""
    if not files:
        return ray.data.from_arrow(
            pa.table({"action": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        )

    def parse(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for blob in batch["bytes"].to_pylist():
            expect_doc = False
            for line in blob.decode().splitlines():
                if not line:
                    continue
                if expect_doc:  # source document line of an index action
                    expect_doc = False
                    continue
                obj = json.loads(line)
                action = next(iter(obj))
                counts[action] = counts.get(action, 0) + 1
                expect_doc = action == "index"
        items = sorted(counts.items())
        return pa.table(
            {
                "action": pa.array([a for a, _ in items], pa.string()),
                "n": pa.array([n for _, n in items], pa.int64()),
            }
        )

    return ray.data.read_binary_files(files).map_batches(
        parse, batch_format="pyarrow", batch_size=8
    )


def read_bulk_payload_stats(files: list[str]) -> ray.data.Dataset:
    """Parse bulk NDJSON segments back and aggregate the SOURCE DOCUMENT
    payloads per op: (op, n, sum_lsn, sum_turn_idx, sum_text_chars)
    partials per file batch — the payload-content half of the sink
    round-trip check (the action-count half alone cannot catch a writer
    that corrupts document bodies)."""
    schema = pa.schema(
        [
            ("op", pa.string()),
            ("n", pa.int64()),
            ("sum_lsn", pa.int64()),
            ("sum_turn_idx", pa.int64()),
            ("sum_text_chars", pa.int64()),
        ]
    )
    if not files:
        return ray.data.from_arrow(schema.empty_table())

    def parse(batch: pa.Table) -> pa.Table:
        import io

        import pandas as pd

        src_lines: list[str] = []
        for blob in batch["bytes"].to_pylist():
            expect_doc = False
            for line in blob.decode().splitlines():
                if not line:
                    continue
                if expect_doc:
                    src_lines.append(line)
                    expect_doc = False
                    continue
                action = next(iter(json.loads(line)))
                expect_doc = action == "index"
        if not src_lines:
            return schema.empty_table()
        df = pd.read_json(io.StringIO("\n".join(src_lines)), lines=True)
        # astype("string") keeps the .str accessor valid for all-null batches
        df["text_chars"] = df["text"].astype("string").str.len()
        # min_count=1: an all-null group sums to NA (SQL SUM semantics) —
        # pandas' default 0 would hash-mismatch the oracle's NULL
        g = (
            df.groupby("op", sort=True)
            .agg(
                n=("op", "size"),
                sum_lsn=("lsn", lambda s: s.sum(min_count=1)),
                sum_turn_idx=("turn_idx", lambda s: s.sum(min_count=1)),
                sum_text_chars=("text_chars", lambda s: s.sum(min_count=1)),
            )
            .reset_index()
        )
        return pa.table(
            {
                "op": pa.array(g["op"], pa.string()),
                "n": pa.array(g["n"], pa.int64()),
                "sum_lsn": pa.array(g["sum_lsn"], pa.int64(), from_pandas=True),
                "sum_turn_idx": pa.array(
                    g["sum_turn_idx"], pa.int64(), from_pandas=True
                ),
                "sum_text_chars": pa.array(
                    g["sum_text_chars"], pa.int64(), from_pandas=True
                ),
            }
        )

    return ray.data.read_binary_files(files).map_batches(
        parse, batch_format="pyarrow", batch_size=8
    )
