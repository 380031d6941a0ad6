"""Benchmark harness (driver contract).

Runs the headline CDC replay pipeline plus a panel of representative query
pipelines over ``$GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) and
prints ONE JSON line::

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "events_per_sec": ..., ...}

``--scaling`` runs the headline replay twice in FRESH processes at
``num_cpus=8`` and ``num_cpus=32`` on the same input and reports both
throughputs plus scaling efficiency ``(T_8 * 8) / (T_32 * 32)`` (the
sandbox analogue of the north rule's N vs 4N cluster criterion).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

METRIC = (
    "change-events/sec applied end-to-end (CDC replay: snapshot + log -> "
    "normalize/evolve -> salted shuffle -> LWW merge -> parquet lake)"
)


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )


def run_headline(sf_label: str, num_cpus: int) -> dict:
    """Full replay at the fixture tier matching $GRAFT_SF_DIR, consumed by a
    real parquet sink (the end-to-end path the north rule measures)."""
    from tapdata_connectors_ray.fixtures import ensure_fixtures, parquet_num_rows
    from tapdata_connectors_ray.pipelines.replay import replay_final_state

    d = ensure_fixtures(sf_label)
    ev = os.path.join(d, "events.parquet")
    base = os.path.join(d, "transcripts.parquet")
    n_events = parquet_num_rows(ev) + parquet_num_rows(base)

    _init_ray(num_cpus)
    import ray.data

    # spin up the worker pool before timing: cold-start is a fixed cost that
    # would otherwise dominate the small-N comparison
    ray.data.range(num_cpus * 8).map_batches(lambda b: b).count()
    # 256 lake partitions: enough reduce-side parallelism at 4N without
    # flooding the driver's scheduling loop; best-of-N damps shared-box noise
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    sec = None
    for _ in range(max(runs, 1)):
        out_dir = tempfile.mkdtemp(prefix="bench_lake_", dir="/tmp")
        t0 = time.perf_counter()
        ds = replay_final_state(ev, base, num_partitions=256)
        ds.write_parquet(out_dir)
        dt = time.perf_counter() - t0
        sec = dt if sec is None or dt < sec else sec
        shutil.rmtree(out_dir, ignore_errors=True)
    return {"sec": sec, "events": n_events, "events_per_sec": n_events / sec}


def run_query_panel(sf_dir: str) -> dict[str, float]:
    """Wall-time per representative query pipeline over the driver tables."""
    import importlib

    entry = importlib.import_module("__ray_entry__")
    qs = entry.queries()
    panel = [
        "cdc_replay_final_state",
        "cdc_replay_salted",
        "cdc_write_counters",
        "cdc_incremental_multi_epoch",
        "af_lineitem_filter_sort_limit",
        "table_hash_customer",
        "events_tumbling_window",
        "hash_split_shard",
        # training-data ops (present from the point they are implemented)
        "dedup_exact",
        "dedup_exact_incremental",
        "dedup_minhash_lsh",
        "dedup_minhash_incremental",
        "dedup_simhash",
        "ann_cosine_topk",
        "text_quality_scores",
        "text_language_id",
        # round-3 lifecycle / lake-management surface
        "cdc_replay_semijoin",
        "cdc_snapshot_switchover",
        "cdc_multi_table_consistent",
        "cdc_diff_capture_roundtrip",
        "cdc_incremental_mv",
        "events_hopping_window",
        # round-4 additions: distributed-path stress, MQ sink, second MV
        "dedup_minhash_incremental_stress",
        "sink_partitioned_log",
        "cdc_incremental_mv_multi",
        "pk_range_boundaries_strings",
        "kmeans_train",
        "ann_ivf_trained_topk",
        "source_sql_command",
        "text_decontaminate",
        "text_repetition_scores",
        "dedup_connected_components",
        "transcript_render",
        "events_window_incremental",
        # round-4 training additions not yet tracked + round-5 scope closers
        "text_chunking",
        "text_packing",
        "sample_stratified_documents",
        "sink_shard_export",
        "cdc_multi_table_atomic_commit",
        "cdc_partitioned_table_expansion",
        "cdc_live_tail_push",
        "cdc_write_policies",
        # round-5 training additions (epoch order / mixture / classifier)
        "shuffle_epoch_order",
        "sample_mixture_documents",
        "quality_classifier_scores",
        "vocab_top_df",
        # round-5 late additions (JSON projection / survivors / relevance / inc-CC)
        "json_props_agg",
        "dedup_cluster_representatives",
        "text_relevance_topk",
        "dedup_cc_incremental",
        "transcript_quality_gate",
        "transcript_tool_sequences",
        "transcript_piece_packing",
        "embedding_outliers",
        "ann_filtered_topk",
        "search_hybrid_rrf",
        "transcript_piece_render",
        "transcript_tool_transitions",
        # round-5 CDC-lifecycle additions (history / CDF / retention)
        "cdc_scd2_history",
        "cdc_scd2_incremental",
        "cdc_change_data_feed",
        "cdc_cdf_between_epochs",
        "cdc_retention_forget",
        "transcript_render_incremental",
        "cdc_wap_publish",
        "cdc_partition_split",
        "cdc_scd2_asof",
        "cdc_cdf_to_log",
        # round-5 session-4 additions (join view / lateness / loss mask)
        "cdc_join_mv_incremental",
        "cdc_join_mv_atomic",
        "events_window_late_data",
        "transcript_loss_mask",
        "events_window_topk",
        "transcript_loss_mask_incremental",
        "cdc_join_rollup_incremental",
        "sample_transcripts_by_channel",
        "cdc_dim_scd2_history",
        "cdc_join_mv_snowflake",
    ]
    out: dict[str, float] = {}
    for name in panel:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        res = fn(sf_dir)
        # consume lazily-built datasets so we time execution, not graph build
        if hasattr(res, "count") and not hasattr(res, "columns"):
            res.count()
        elif hasattr(res, "to_pandas") and not isinstance(res, __import__("pandas").DataFrame):
            res.to_pandas()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_probe() -> dict | None:
    """Host-quietness stamp (single-threaded matmul floor, see
    scripts/quiet_probe.py).  Embedded in every emitted JSON line so the
    BENCH artifact of record is interpretable without forensics: quiet
    windows on this box read ~0.35-0.45 s/multiply; the documented degraded
    windows read ~0.9-1.1 s.  Runs in a subprocess so the BLAS thread caps
    never leak into the benchmark process itself."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "quiet_probe.py")
    try:
        proc = subprocess.run(
            [sys.executable, script], capture_output=True, text=True, timeout=60
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def _headline_subprocess(num_cpus: int, sf_label: str, runs: str | None = None) -> dict:
    """Fresh-process headline run (clean ray session at the given CPU count)."""
    env = dict(os.environ)
    env["RAY_GRAFT_CPUS"] = str(num_cpus)
    env["GRAFT_SF_DIR"] = f"/root/testdata/{sf_label}"
    if runs is not None:
        env["BENCH_RUNS"] = runs
    env.setdefault("BENCH_RUNS", "3")
    cmd = [sys.executable, os.path.abspath(__file__), "--headline-only"]
    # pin the whole Ray process tree to exactly num_cpus cores so the low-N
    # run can't borrow machine cores beyond its slot count (faithful N-node
    # emulation on one box); skip if taskset is unavailable
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{num_cpus - 1}"] + cmd
    proc = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if proc.returncode != 0:
        raise RuntimeError(f"headline subprocess failed:\n{proc.stderr[-4000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def run_scaling(sf_label: str) -> dict:
    # the scaling proof runs at a tier with enough work per core that the
    # job is compute-bound at both parallelism levels (north-rule N vs 4N);
    # sf3 = 36M events (generated+cached on first use; sf1 is overhead-bound
    # at 32 slots — see BASELINE.md measured results)
    sf_label = os.environ.get("BENCH_SCALING_SF", "sf3")
    # N vs 4N slots; overridable so the pair can be sized BELOW the box's
    # core count (e.g. 4->16 on a 32-core box) — on a shared host, co-tenant
    # load otherwise starves the wide run asymmetrically and the measured
    # efficiency reflects the neighbors, not the engine
    lo = int(os.environ.get("BENCH_CPUS_LO", "8"))
    hi = int(os.environ.get("BENCH_CPUS_HI", "32"))
    # INTERLEAVED legs (lo,hi,lo,hi,...), best-of per leg: on a shared box a
    # co-tenant burst lasting minutes would otherwise consume one whole leg
    # and fabricate an arbitrary ratio; interleaving means a burst costs one
    # leg INSTANCE while its sibling instances survive.  Rounds × inner
    # BENCH_RUNS = total reps per leg.
    rounds = max(1, int(os.environ.get("BENCH_SCALING_ROUNDS", "2")))
    # repetition comes from the interleaved rounds; default each subprocess
    # to a single inner run so total wall-time stays ~what two plain legs
    # cost (override with BENCH_RUNS) — per-subprocess env only, the parent
    # process env is left alone
    inner_runs = os.environ.get("BENCH_RUNS", "1")
    r_lo: dict = {}
    r_hi: dict = {}
    for i in range(rounds):
        cur_lo = _headline_subprocess(lo, sf_label, runs=inner_runs)
        # partial progress on stderr: a killed run still yields prior legs
        print(f"[scaling] lo leg {i}: {cur_lo}", file=sys.stderr, flush=True)
        if not r_lo or cur_lo["sec"] < r_lo["sec"]:
            r_lo = cur_lo
        cur_hi = _headline_subprocess(hi, sf_label, runs=inner_runs)
        print(f"[scaling] hi leg {i}: {cur_hi}", file=sys.stderr, flush=True)
        if not r_hi or cur_hi["sec"] < r_hi["sec"]:
            r_hi = cur_hi
    # efficiency: throughput gain vs resource gain (1.0 = perfect linear)
    eff = (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / (hi / lo)
    return {
        "sf": sf_label,
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "events_per_sec_lo": round(r_lo["events_per_sec"], 1),
        "events_per_sec_hi": round(r_hi["events_per_sec"], 1),
        "sec_lo": round(r_lo["sec"], 3),
        "sec_hi": round(r_hi["sec"], 3),
        "scaling_efficiency": round(eff, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--no-panel", action="store_true")
    args = ap.parse_args()

    from tapdata_connectors_ray.fixtures import sf_label_from_dir

    sf_label = sf_label_from_dir(SF_DIR)

    import ray

    if args.headline_only:
        h = run_headline(sf_label, NUM_CPUS)
        print(json.dumps({**h, "num_cpus": NUM_CPUS, "sf": sf_label}))
        ray.shutdown()
        return

    # probe BEFORE the measured work (round-4 verdict ask: the window stamp
    # must live in the artifact itself); --headline-only skips it because the
    # scaling harness calls that mode in a timed subprocess
    probe = run_probe()

    if args.scaling:
        result = run_scaling(sf_label)
        result.update({"metric": METRIC + " [scaling N->4N]", "unit": "sec"})
        # a multi-minute interleaved run can straddle a window change; stamp
        # both edges
        result.update({"probe": probe, "probe_after": run_probe()})
        print(json.dumps(result))
        return

    h = run_headline(sf_label, NUM_CPUS)
    queries = {} if args.no_panel else run_query_panel(SF_DIR)
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": round(h["sec"], 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf_label,
                "num_cpus": NUM_CPUS,
                "events": h["events"],
                "events_per_sec": round(h["events_per_sec"], 1),
                "probe": probe,
                "probe_after": run_probe(),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
