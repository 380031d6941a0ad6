"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

No ``ray.init()``/``ray.shutdown()`` here or in the library — the driver
owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: CDC replay (snapshot + change log -> lake table)
    at the smallest fixture tier."""
    from tapdata_connectors_ray.pipelines.entrypoints import flagship_entry

    return flagship_entry()


# Queries that run before everything else (cheap conformance checks that a
# time-bounded driver sweep must never truncate away; dict order = run order).
_RUN_FIRST = (
    # round-3 second-half additions — never driver-run before r03, so they
    # must land CORRECTNESS rows even under a truncated sweep (cheap first)
    "dedup_exact_incremental",
    "dedup_minhash_incremental",
    "dedup_embedding_incremental",
    "dedup_simhash_incremental",
    "processor_chain_orders",
    "sample_hash_documents",
    "profile_customer",
    "text_mask_documents",
    "lookup_enrich_customer",
    "events_hopping_window",
    "quantiles_lineitem",
    "cdc_multi_table_consistent",
    "cdc_multi_table_single_pass",
    "cdc_dlq_reasons",
    "cdc_dlq_routing",
    "cdc_partition_resync",
    "cdc_snapshot_switchover",
    "cdc_time_travel",
    "cdc_inspect_diff",
    "cdc_diff_capture_roundtrip",
    "cdc_delta_minor_compact",
    "cdc_incremental_mv",
    # round-3 first-half list (unverified as of r02)
    "source_csv_events_agg",
    "source_xml_events_agg",
    "source_xlsx_events_agg",
    "source_jsonl_resume",
    "source_csv_dialect",
    "source_storage_mock_backend",
    "source_partitioned_log",
    "sink_bulk_ndjson",
    "sink_kv_state",
    "cdc_patch_merge",
    "subdoc_array_state",
    "events_asof_join",
    "events_follow_within",
    "multimodal_frame_sample",
)


def _front_load(out: dict) -> dict:
    ordered = {k: out[k] for k in _RUN_FIRST if k in out}
    ordered.update((k, v) for k, v in out.items() if k not in ordered)
    return ordered


def queries() -> dict[str, Callable[[str], Any]]:
    from tapdata_connectors_ray.pipelines.entrypoints import cdc_queries
    from tapdata_connectors_ray.pipelines.filesource import filesource_queries
    from tapdata_connectors_ray.pipelines.relational import relational_queries
    from tapdata_connectors_ray.pipelines.training import training_queries

    out: dict[str, Callable[[str], Any]] = {}
    out.update(cdc_queries())
    out.update(relational_queries())
    out.update(training_queries())
    out.update(filesource_queries())
    return _front_load(out)


def oracle_sql() -> dict[str, str]:
    from tapdata_connectors_ray.pipelines.entrypoints import cdc_oracle_sql
    from tapdata_connectors_ray.pipelines.filesource import filesource_oracle_sql
    from tapdata_connectors_ray.pipelines.relational import relational_oracle_sql
    from tapdata_connectors_ray.pipelines.training import training_oracle_sql

    out: dict[str, str] = {}
    out.update(cdc_oracle_sql())
    out.update(relational_oracle_sql())
    out.update(training_oracle_sql())
    out.update(filesource_oracle_sql())
    return _front_load(out)
