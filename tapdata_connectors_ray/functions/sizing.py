"""Fan-out sizing: derive shuffle/join/bucket counts from input size and
cluster CPUs instead of hardcoding them.

Two regimes matter:

- **Ray grouped aggregates pay ~0.5 ms per group**, so coarse-bucket
  groupbys (the pair-reduce pattern in ``stages/dedup.py``) must keep the
  GROUP count modest while bounding the per-bucket width (one bucket = one
  task = one pandas frame in memory).  :func:`coarse_buckets` targets a
  fixed per-bucket row width and clamps the count to [256, 4096]; beyond
  ~4096 × target width (≈ 2.7 × 10^8 bucketed rows) a second bucket level is
  the documented scale path.
- **``Dataset.join`` spawns one aggregator actor per partition**, so the
  partition count should track cluster CPUs (small side) and input volume
  (large side): :func:`join_partitions` sizes to ~half the CPUs, raised so
  no partition is expected to hold more than ~1M rows, capped at 256.

Both helpers degrade gracefully when Ray is not initialised (fixed
defaults) so library code stays importable everywhere.
"""

from __future__ import annotations

COARSE_BUCKET_MIN = 256
COARSE_BUCKET_MAX = 4096
COARSE_BUCKET_TARGET_ROWS = 64 * 1024

JOIN_PARTITION_MAX = 256
JOIN_ROWS_PER_PARTITION = 1_000_000
# a join partition below this row count costs more in aggregator-actor
# startup than it buys in parallelism — small inputs get few partitions
JOIN_ROWS_PER_PARTITION_MIN = 32_768


def _cluster_cpus(default: int = 8) -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default)) or default
    except Exception:
        pass
    return default


def coarse_buckets(est_rows: int | None = None) -> int:
    """Bucket count for a coarse-keyed groupby over ~``est_rows`` rows:
    per-bucket width ≈ COARSE_BUCKET_TARGET_ROWS, clamped so group-count
    overhead stays bounded.  ``None`` (unknown size) keeps the floor."""
    if est_rows is None:
        return COARSE_BUCKET_MIN
    return int(
        min(COARSE_BUCKET_MAX, max(COARSE_BUCKET_MIN, est_rows // COARSE_BUCKET_TARGET_ROWS))
    )


def join_partitions(est_rows: int | None = None) -> int:
    """Partition count for ``Dataset.join``: ~CPUs/2 aggregator actors —
    lowered when the data doesn't fill them (a partition under ~32k rows is
    aggregator-startup-bound), raised so an expected partition holds
    ≲ JOIN_ROWS_PER_PARTITION rows of the larger side, capped at
    JOIN_PARTITION_MAX."""
    p = max(2, _cluster_cpus() // 2)
    if est_rows is not None:
        p = min(p, max(2, est_rows // JOIN_ROWS_PER_PARTITION_MIN))
        p = max(p, min(JOIN_PARTITION_MAX, est_rows // JOIN_ROWS_PER_PARTITION))
    return int(min(p, JOIN_PARTITION_MAX))


def actor_pool(max_frac: float = 0.5, min_actors: int = 1) -> tuple[int, int]:
    """(min, max) for an autoscaling actor-pool ``map_batches`` stage: start
    small (setup cost is per-actor), let backlog grow the pool to
    ~``max_frac`` of cluster CPUs.  Replaces literal ``concurrency=(1, 2)``
    caps that starve the stage on bigger clusters."""
    return (min_actors, max(2, int(_cluster_cpus() * max_frac)))
