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


# Queries that run before everything else (dict order = run order; the
# driver caps a sweep at 50 queries, so the set whose newest green row is
# OLDEST goes first).  Round 4: the 21 queries with NO driver row yet, then
# 29 of the 36 whose last driver row is CORRECTNESS_r02 (round 3's driver
# run spent its 50 slots on the then-new queries) — 50 total.
#
# ROUND 5 ROTATION (do this first next round): front-load the SEVEN
# r2-only queries left past this round's cap — `batch_count_orders`,
# `min_max_lineitem`, `table_stats_orders`, `point_lookup_customer`,
# `af_customer_match`, `count_by_filter_events`, and the
# `dedup_minhash_lsh_join` alias.  All are trivial count/min-max/metadata/
# point-lookup/filter queries (code unchanged since r02, green r02 rows);
# after that, every registry entry has a ≤2-round-old driver row.
_RUN_FIRST = (
    # new in round 4 — no driver row yet
    "transcript_render",
    "events_window_incremental",
    "curation_incremental",
    "sink_bulk_ndjson_payload",
    "text_decontaminate",
    "text_repetition_scores",
    "dedup_connected_components",
    "dedup_connected_components_stress",
    "sink_shard_export",
    "dedup_minhash_incremental_stress",
    "dedup_embedding_incremental_stress",
    "pk_range_boundaries_strings",
    "sink_partitioned_log",
    "cdc_incremental_mv_multi",
    "kmeans_train",
    "source_sql_command",
    "ann_ivf_trained_topk",
    "ann_ivf_incremental_topk",
    "text_chunking",
    "text_packing",
    "sample_stratified_documents",
    # green in r02 but not re-run since (driver 50-query cap).
    # af_customer_match rotates past the cap with the other trivial r2-only
    # queries (simple match filter, green r02, code unchanged) to make room
    # for transcript_render
    "af_lineitem_filter_sort_limit",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "cdc_double_active_filter",
    "cdc_replay_nopk",
    "cdc_replay_second_table",
    "cdc_write_policies",
    # count_by_filter_events rotates past the cap with the other trivial
    # r2-only count queries (green r02, code unchanged) to make room for
    # events_window_incremental
    "curation_pipeline",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    # NOT front-loaded: dedup_minhash_lsh_join is a pure alias of
    # dedup_minhash_lsh (same callable) — a fresh row for one refreshes the
    # other, and the slot goes to a genuinely new query instead
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "distinct_segments",
    "events_session_windows",
    "events_tumbling_window",
    "hash_split_shard",
    "master_subdoc_merge",
    "multimodal_decode_features",
    "multimodal_payload_stats",
    "multimodal_resize_pipeline",
    "pk_range_boundaries_orders",
    # point_lookup_customer rotates past the cap with the other trivial
    # r2-only queries to make room for sink_bulk_ndjson_payload
    "table_hash_customer",
    # table_stats_orders rotates past the cap with the other trivial
    # metadata/count queries (green r02 row, code unchanged) to make room
    # for curation_incremental

    "text_bigram_topk",
    "text_fingerprint",
    "text_language_id",
    "text_quality_scores",
    "text_token_counts",
    "typelattice_roundtrip",
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
