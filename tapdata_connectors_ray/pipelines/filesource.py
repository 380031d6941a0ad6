"""File-source conformance queries: CSV / JSONL segment ingest with
offset-resume, oracle-checked against DuckDB reading the same bytes.

The fixture segments are materialized once under /tmp from the driver's
``events`` table (deterministic content), so both engines read identical
files — the file-connector analogue of the CDC fixture oracles.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Max, Min

from tapdata_connectors_ray.fixtures import sf_label_from_dir
from tapdata_connectors_ray.sources.files import (
    FileSourceOffset,
    read_csv_segments,
    read_jsonl_segments,
    read_xlsx_segments,
    read_xml_segments,
    scan_new_files,
    write_csv_segments,
    write_jsonl_segments,
    write_xlsx_segments,
    write_xml_segments,
)

_SEG_VERSION = 2
_COLS = ["user_id", "event_type", "value"]
_EVENT_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("event_type", pa.string()), ("value", pa.float64())]
)


def ensure_event_segments(sf_dir: str, fmt: str) -> str:
    """events.parquet -> /tmp CSV or JSONL segment dir (cached)."""
    sf = sf_label_from_dir(sf_dir)
    out = f"/tmp/tcr_fixtures/{sf}/events_{fmt}"
    marker = os.path.join(out, f".v{_SEG_VERSION}")
    if os.path.exists(marker):
        return out
    table = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=_COLS)
    os.makedirs(out, exist_ok=True)
    writer = {
        "csv": write_csv_segments,
        "jsonl": write_jsonl_segments,
        "xml": write_xml_segments,
        "xlsx": write_xlsx_segments,
    }[fmt]
    writer(table, out)
    open(marker, "w").close()
    return out


def _event_type_agg(ds: ray.data.Dataset) -> Any:
    out = (
        ds.groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Min("value", alias_name="mn"),
            Max("value", alias_name="mx"),
        )
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def q_source_csv_events_agg(sf_dir: str) -> Any:
    """Full batch read of a CSV segment directory (one read task per
    segment) -> grouped count/min/max."""
    seg_dir = ensure_event_segments(sf_dir, "csv")
    files, _ = scan_new_files(seg_dir)
    return _event_type_agg(read_csv_segments(files, _EVENT_SCHEMA))


def q_source_xml_events_agg(sf_dir: str) -> Any:
    """XML segment directory (stdlib parse, one read task per file; floats
    written shortest-round-trip so values are bit-identical) -> same agg;
    oracle aggregates the source parquet the segments derive from."""
    seg_dir = ensure_event_segments(sf_dir, "xml")
    files, _ = scan_new_files(seg_dir, suffixes=(".xml",))
    return _event_type_agg(read_xml_segments(files, _EVENT_SCHEMA))


def q_source_xlsx_events_agg(sf_dir: str) -> Any:
    """XLSX segment directory — a real OOXML reader (zip + sheet XML,
    inline strings / numeric cells) built on stdlib; the excel-connector
    surface without POI."""
    seg_dir = ensure_event_segments(sf_dir, "xlsx")
    files, _ = scan_new_files(seg_dir, suffixes=(".xlsx",))
    return _event_type_agg(read_xlsx_segments(files, _EVENT_SCHEMA))


def q_source_jsonl_resume(sf_dir: str) -> Any:
    """Offset-resume: mark the first half of the JSONL segments as already
    ingested (the persisted known-file map), poll, and ingest only the
    delta — the ``batchRead``-pause -> ``streamRead``-resume contract."""
    seg_dir = ensure_event_segments(sf_dir, "jsonl")
    all_files, full_offset = scan_new_files(seg_dir)
    half = len(all_files) // 2
    prior = FileSourceOffset(
        {p: full_offset.known[p] for p in all_files[:half]}
    )
    # resume semantics (fresh == second half, offsets advance) are asserted
    # in tests/test_filesource.py; the oracle aggregate over exactly the
    # second-half files catches any divergence as a value diff here
    fresh, _ = scan_new_files(seg_dir, prior)
    return _event_type_agg(read_jsonl_segments(fresh))


def ensure_tsv_segments(sf_dir: str) -> str:
    """events -> tab-separated segments with quoted strings (a non-default
    dialect: separator='\\t'), deterministic content, cached under /tmp."""
    import pyarrow.csv as pacsv

    sf = sf_label_from_dir(sf_dir)
    out = f"/tmp/tcr_fixtures/{sf}/events_tsv"
    marker = os.path.join(out, f".v{_SEG_VERSION}")
    if os.path.exists(marker):
        return out
    table = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=_COLS)
    os.makedirs(out, exist_ok=True)
    wo = pacsv.WriteOptions(delimiter="\t")
    for i in range(0, table.num_rows, 8192):
        pacsv.write_csv(
            table.slice(i, 8192), os.path.join(out, f"seg-{i // 8192:05d}.tsv"), wo
        )
    open(marker, "w").close()
    return out


def q_source_csv_dialect(sf_dir: str) -> Any:
    """Non-default CSV dialect (tab separator) through CsvReadOptions — the
    reference's separator/quoteChar config surface (CsvConfig.java) mapped
    onto the Arrow CSV reader; oracle reads the same bytes with DuckDB's
    read_csv(sep='\\t')."""
    from tapdata_connectors_ray.sources.files import CsvReadOptions

    seg_dir = ensure_tsv_segments(sf_dir)
    files, _ = scan_new_files(seg_dir, suffixes=(".tsv",))
    ds = read_csv_segments(files, _EVENT_SCHEMA, options=CsvReadOptions(separator="\t"))
    return _event_type_agg(ds)


def q_source_storage_mock_backend(sf_dir: str) -> Any:
    """Round trip through the pluggable storage SPI's mock network backend
    (the FTP/SFTP/SMB/S3/OSS stand-in, ``file-storages/.../FileStorage``):
    events -> CSV segments written via ``storage.write_bytes`` into a
    ``MemoryFileStorage``, polled with the same new/modified scanner, parsed
    from storage bytes — same aggregate, same oracle as the local-dir CSV
    query, proving backend choice doesn't change results."""
    from tapdata_connectors_ray.sources.files import (
        read_csv_segment_bytes,
        write_csv_segment_bytes,
    )
    from tapdata_connectors_ray.sources.storage import MemoryFileStorage

    table = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=_COLS)
    mem = MemoryFileStorage()
    write_csv_segment_bytes(table, "/mock/events_csv", storage=mem)
    files, _ = scan_new_files("/mock/events_csv", suffixes=(".csv",), storage=mem)
    return _event_type_agg(read_csv_segment_bytes(files, _EVENT_SCHEMA, storage=mem))


def _csv_glob(sf_dir: str) -> str:
    return ensure_event_segments(sf_dir, "csv") + "/*.csv"


def _jsonl_second_half(sf_dir: str) -> list[str]:
    seg_dir = ensure_event_segments(sf_dir, "jsonl")
    files = sorted(f for f in os.listdir(seg_dir) if f.endswith(".jsonl"))
    half = len(files) // 2
    return [os.path.join(seg_dir, f) for f in files[half:]]


def q_source_partitioned_log(sf_dir: str) -> Any:
    """Kafka-shaped ingest: the change log is produced into a 4-partition
    topic keyed by conv_id (per-key ordering within a partition only), the
    consumer polls twice with a per-partition offset map, and the consumed
    segments replay to the final lake state — proving cross-partition
    disorder is absorbed by the LSN merge."""
    import tempfile

    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.replay import replay_final_state
    from tapdata_connectors_ray.sources.partitioned_log import poll_topic, write_topic

    ev, base = _fixture_paths(sf_dir)
    table = pq.read_table(ev)
    topic = tempfile.mkdtemp(prefix="topic_", dir="/tmp")
    half = table.num_rows // 2

    consumed: list[str] = []
    offset = None
    for chunk in (table.slice(0, half), table.slice(half)):
        write_topic(chunk, topic, "conv_id", n_partitions=4)
        fresh, offset = poll_topic(topic, offset)
        consumed.extend(fresh)
    # exactly-once consumption (a third poll returns nothing) is asserted in
    # tests/test_extension.py; any double-consumption here would surface as a
    # value diff against the final-state oracle
    return replay_final_state(consumed, base, num_partitions=64)


def q_sink_bulk_ndjson(sf_dir: str) -> Any:
    """Bulk-operation sink round-trip (the ES _bulk surface,
    ``ElasticsearchRecordWriter.java:74+``): the normalized change feed
    (key-move expansion included, combiner off — a sink must see every
    effective event) writes action+source NDJSON segments in parallel, the
    segments are read back and parsed, and the per-action counts must equal
    the log's op counts."""
    import tempfile

    from ray.data.aggregate import Sum

    from tapdata_connectors_ray.pipelines.replay import normalized_events
    from tapdata_connectors_ray.sources.files import (
        read_bulk_action_counts,
        write_bulk_ndjson_batch,
    )

    ev, _ = _fixture_paths(sf_dir)
    out_dir = tempfile.mkdtemp(prefix="bulk_sink_", dir="/tmp")
    try:
        feed = normalized_events(ev, None, prereduce=False)
        manifest = feed.map_batches(
            write_bulk_ndjson_batch(out_dir, "lake", ["conv_id", "turn_idx"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()  # one row per segment file — metadata scale
        counts = (
            read_bulk_action_counts(manifest["file"].tolist())
            .groupby("action")
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
            .sort_values("action")
            .reset_index(drop=True)
        )
        # the writer-side manifest totals equal the read-back counts by
        # construction; the oracle's op-count compare is the value gate
        return counts
    finally:
        # the dump is corpus-scale — never leave it behind under /tmp
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)


def q_sink_bulk_ndjson_payload(sf_dir: str) -> Any:
    """Payload-content half of the bulk-sink round-trip: the written source
    documents are parsed back and their per-op aggregates (count, LSN sum,
    key sum, text length sum) must equal the change log's — so a writer
    that float-widens ints, reformats timestamps into a different escape,
    or misaligns the action/source interleave fails the VALUE gate, not
    just the count gate."""
    import tempfile

    from ray.data.aggregate import Sum

    from tapdata_connectors_ray.pipelines.replay import normalized_events
    from tapdata_connectors_ray.sources.files import (
        read_bulk_payload_stats,
        write_bulk_ndjson_batch,
    )

    ev, _ = _fixture_paths(sf_dir)
    out_dir = tempfile.mkdtemp(prefix="bulk_sink_", dir="/tmp")
    try:
        feed = normalized_events(ev, None, prereduce=False)
        manifest = feed.map_batches(
            write_bulk_ndjson_batch(out_dir, "lake", ["conv_id", "turn_idx"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()  # one row per segment file — metadata scale
        return (
            read_bulk_payload_stats(manifest["file"].tolist())
            .groupby("op")
            .aggregate(
                Sum("n", alias_name="n"),
                Sum("sum_lsn", alias_name="sum_lsn"),
                Sum("sum_turn_idx", alias_name="sum_turn_idx"),
                Sum("sum_text_chars", alias_name="sum_text_chars"),
            )
            .to_pandas()  # materialized HERE so the dump can be removed
            .sort_values("op")
            .reset_index(drop=True)
        )
    finally:
        # the dump is corpus-scale — never leave it behind under /tmp
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)


def q_sink_partitioned_log(sf_dir: str) -> Any:
    """MQ producer sink round-trip (the replicate-OUT direction the
    reference ships as ``AbstractMqService``/``BatchPusher``): the
    normalized change feed is produced DISTRIBUTED into a partitioned topic
    with the MqOp envelope, read back via the consumer poll, and aggregated
    per op tag — (count, sum of LSNs, distinct keys) must equal the log's.
    Key-move tombstones carry the moved key and the original LSN, so every
    column is oracle-expressible."""
    import tempfile

    import numpy as np

    from tapdata_connectors_ray.functions.hashing import stable_hash_strings
    from tapdata_connectors_ray.pipelines.replay import normalized_events
    from tapdata_connectors_ray.sources.partitioned_log import (
        poll_topic,
        read_topic_segments,
        write_topic_dataset,
    )

    ev, _ = _fixture_paths(sf_dir)
    topic = tempfile.mkdtemp(prefix="topic_sink_", dir="/tmp")
    feed = normalized_events(ev, None, prereduce=False)
    write_topic_dataset(feed, topic, "conv_id", n_partitions=8).materialize()
    files, _ = poll_topic(topic)
    back = read_topic_segments(files)

    # per-(op, key) partials inside each batch, bucket-folded (the coarse-
    # bucket pattern: a pair-level Ray groupby would pay per-group overhead)
    def partials(batch: pa.Table) -> pa.Table:
        df = batch.select(["mq_op", "conv_id", "lsn"]).to_pandas()
        g = (
            df.groupby(["mq_op", "conv_id"], sort=False)["lsn"]
            .agg(["size", "sum"])
            .reset_index()
        )
        kb = (
            stable_hash_strings(g["conv_id"].to_numpy(object).astype(str))
            % np.uint64(64)
        ).astype(np.int32)
        return pa.table(
            {
                "kbucket": pa.array(kb),
                "mq_op": pa.array(g["mq_op"], pa.string()),
                "conv_id": pa.array(g["conv_id"], pa.string()),
                "n_part": pa.array(g["size"].to_numpy(np.int64)),
                "lsn_part": pa.array(g["sum"].to_numpy(np.int64)),
            }
        )

    def fold(df) -> "pd.DataFrame":
        import pandas as pd

        g = (
            df.groupby(["mq_op", "conv_id"], sort=False)[["n_part", "lsn_part"]]
            .sum()
            .reset_index()
        )
        out = g.groupby("mq_op", sort=False).agg(
            n=("n_part", "sum"), sum_lsn=("lsn_part", "sum"), n_keys=("conv_id", "nunique")
        )
        return out.reset_index()

    partial_ds = back.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    per_bucket = partial_ds.groupby("kbucket").map_groups(fold, batch_format="pandas")
    agg = (
        per_bucket.to_pandas()  # ≤ 64 buckets × 3 ops — metadata scale
        .groupby("mq_op", sort=True)[["n", "sum_lsn", "n_keys"]]
        .sum()
        .reset_index()
    )
    return agg


def _sink_topic_sql() -> str:
    from tapdata_connectors_ray.pipelines.entrypoints import _oracle_events_path

    ev = _oracle_events_path()
    return f"""
WITH ev AS (
    SELECT op, conv_id, lsn FROM read_parquet('{ev}') WHERE op <> 'DDL'
), moved AS (
    SELECT 'D' AS op, before_conv_id AS conv_id, lsn FROM read_parquet('{ev}')
    WHERE op = 'U' AND before_turn_idx IS NOT NULL
      AND (before_conv_id <> conv_id OR before_turn_idx <> turn_idx)
), allv AS (
    SELECT * FROM ev UNION ALL SELECT * FROM moved
)
SELECT CASE op WHEN 'I' THEN 'insert' WHEN 'U' THEN 'update'
       ELSE 'delete' END AS mq_op,
       count(*) AS n,
       CAST(sum(lsn) AS BIGINT) AS sum_lsn,
       count(DISTINCT conv_id) AS n_keys
FROM allv GROUP BY 1 ORDER BY 1
"""


def _fixture_paths(sf_dir: str):
    from tapdata_connectors_ray.pipelines.entrypoints import _fixture_paths_for

    return _fixture_paths_for(sf_dir)


def filesource_queries() -> dict[str, Callable[[str], Any]]:
    return {
        "source_csv_events_agg": q_source_csv_events_agg,
        "source_xml_events_agg": q_source_xml_events_agg,
        "source_xlsx_events_agg": q_source_xlsx_events_agg,
        "source_jsonl_resume": q_source_jsonl_resume,
        "source_csv_dialect": q_source_csv_dialect,
        "source_storage_mock_backend": q_source_storage_mock_backend,
        "source_partitioned_log": q_source_partitioned_log,
        "sink_bulk_ndjson": q_sink_bulk_ndjson,
        "sink_bulk_ndjson_payload": q_sink_bulk_ndjson_payload,
        "sink_partitioned_log": q_sink_partitioned_log,
    }


def _bulk_counts_sql() -> str:
    from tapdata_connectors_ray.pipelines.entrypoints import _oracle_events_path

    ev = _oracle_events_path()
    return f"""
WITH ev AS (
    SELECT op FROM read_parquet('{ev}') WHERE op <> 'DDL'
), moved AS (
    SELECT 'D' AS op FROM read_parquet('{ev}')
    WHERE op = 'U' AND before_turn_idx IS NOT NULL
      AND (before_conv_id <> conv_id OR before_turn_idx <> turn_idx)
), allv AS (
    SELECT * FROM ev UNION ALL SELECT * FROM moved
)
SELECT CASE WHEN op = 'D' THEN 'delete' ELSE 'index' END AS action,
       count(*) AS n
FROM allv GROUP BY 1 ORDER BY 1
"""


def _bulk_payload_sql() -> str:
    from tapdata_connectors_ray.pipelines.entrypoints import _oracle_events_path

    ev = _oracle_events_path()
    # index-action source documents = every non-DDL, non-delete event with
    # its own payload (key-move expansion only ADDS delete actions, which
    # carry no source line)
    return f"""
SELECT op, count(*) AS n,
       CAST(sum(lsn) AS BIGINT) AS sum_lsn,
       CAST(sum(turn_idx) AS BIGINT) AS sum_turn_idx,
       CAST(sum(length(text)) AS BIGINT) AS sum_text_chars
FROM read_parquet('{ev}')
WHERE op NOT IN ('DDL', 'D')
GROUP BY op ORDER BY op
"""


def filesource_oracle_sql(oracle_sf_dir: str | None = None) -> dict[str, str]:
    from tapdata_connectors_ray.fixtures import oracle_sf_dir as _default_tier
    from tapdata_connectors_ray.pipelines.entrypoints import _final_state_sql

    if oracle_sf_dir is None:
        oracle_sf_dir = _default_tier()

    # render against the driver's correctness tier (files are materialized
    # by this call so the SQL always has bytes to read)
    csv_glob = _csv_glob(oracle_sf_dir)
    jsonl_files = ", ".join(f"'{p}'" for p in _jsonl_second_half(oracle_sf_dir))
    # XML/XLSX have no DuckDB reader; their segments derive deterministically
    # from the events table with exact float round-trip, so the oracle
    # aggregates the source parquet (value-level check of the round trip)
    events_agg_sql = """
        SELECT event_type, count(*) AS n, min(value) AS mn, max(value) AS mx
        FROM events GROUP BY event_type ORDER BY event_type
    """
    # materialize the segment files for the Ray side
    ensure_event_segments(oracle_sf_dir, "xml")
    ensure_event_segments(oracle_sf_dir, "xlsx")
    tsv_glob = ensure_tsv_segments(oracle_sf_dir) + "/*.tsv"
    return {
        "source_csv_dialect": f"""
            SELECT event_type, count(*) AS n, min(value) AS mn, max(value) AS mx
            FROM read_csv('{tsv_glob}', header=true, sep='\t',
                          columns={{'user_id':'BIGINT','event_type':'VARCHAR','value':'DOUBLE'}})
            GROUP BY event_type ORDER BY event_type
        """,
        "source_csv_events_agg": f"""
            SELECT event_type, count(*) AS n, min(value) AS mn, max(value) AS mx
            FROM read_csv('{csv_glob}', header=true,
                          columns={{'user_id':'BIGINT','event_type':'VARCHAR','value':'DOUBLE'}})
            GROUP BY event_type ORDER BY event_type
        """,
        "source_xml_events_agg": events_agg_sql,
        "source_xlsx_events_agg": events_agg_sql,
        # mock-backend round trip derives from the same events table; the
        # backend must be invisible in the values
        "source_storage_mock_backend": events_agg_sql,
        "sink_bulk_ndjson": _bulk_counts_sql(),
        "sink_bulk_ndjson_payload": _bulk_payload_sql(),
        "sink_partitioned_log": _sink_topic_sql(),
        "source_partitioned_log": _final_state_sql(),
        "source_jsonl_resume": f"""
            SELECT event_type, count(*) AS n, min(value) AS mn, max(value) AS mx
            FROM read_json([{jsonl_files}],
                           columns={{'user_id':'BIGINT','event_type':'VARCHAR','value':'DOUBLE'}})
            GROUP BY event_type ORDER BY event_type
        """,
    }
