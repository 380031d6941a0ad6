"""tapdata_connectors_ray — a Ray-Data-native CDC / incremental-ingest engine.

A brand-new engine (NOT a port) with the data-processing capabilities of the
reference connector repository (`SoloJu/tapdata-connectors`, see SURVEY.md):
ordered change-event replay (binlog/WAL analogue) -> hash-partitioned
last-writer-wins upsert into a Parquet lake table, with schema evolution,
exactly-once idempotent apply, and checkpoint/resume with per-partition
lineage -- expressed as ray.data.Dataset pipelines of ``map_batches`` over
zero-copy Arrow batches, plus the query algebra (advance-filter), consistency
aggregates (count / min-max / table-hash) and the training-data operator suite
(dedup, similarity search, text analysis) that a 100 TB pipeline needs.

Layout:
    schema.py        Arrow schemas + the portable type lattice
    fixtures.py      deterministic synthetic transcripts + change-event log
    oracle.py        single-process reference reducer (pytest ground truth)
    stages/          map_batches stage bodies (normalize, pre-reduce, merge)
    state/           schema registry, checkpoint manifest
    sources/         event-log / file / synthetic sources
    functions/       advance-filter algebra, consistency aggregates
    pipelines/       end-to-end pipelines (replay, incremental, dedup, ...)
"""

from tapdata_connectors_ray.schema import (  # noqa: F401
    EVENT_LOG_SCHEMA,
    TRANSCRIPTS_SCHEMA,
    TRANSCRIPTS_SPEC,
    LATEST_TRANSCRIPTS_SCHEMA,
    TableSpec,
)

__version__ = "0.1.0"
