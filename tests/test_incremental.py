"""Checkpointed incremental ingest: exactly-once, resume, crash recovery
(FIXTURES.md §4.5/4.6; models ``BatchReadPauseAndStreamReadTest``)."""

import shutil
import tempfile

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tapdata_connectors_ray.oracle import expected_final_state
from tapdata_connectors_ray.pipelines.incremental import CheckpointedIngest
from tapdata_connectors_ray.state.checkpoint import load_manifest


@pytest.fixture(scope="module")
def paths(smoke_fixture_dir):
    return (
        smoke_fixture_dir + "/events.parquet",
        smoke_fixture_dir + "/transcripts.parquet",
    )


@pytest.fixture(scope="module")
def expected(paths):
    ev, base = paths
    return expected_final_state(pq.read_table(base), pq.read_table(ev))


@pytest.fixture()
def lake_dir():
    d = tempfile.mkdtemp(prefix="lake_", dir="/tmp")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _as_sorted_df(ds_or_table) -> pd.DataFrame:
    df = ds_or_table.to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df["turn_score"] = df["turn_score"].astype("Int64")
    df["turn_idx"] = df["turn_idx"].astype("Int32")
    return df


def assert_lake_matches(ingest, expected):
    pd.testing.assert_frame_equal(
        _as_sorted_df(ingest.final_dataset()), _as_sorted_df(expected)
    )


def test_single_epoch(paths, expected, lake_dir):
    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest(ev, base)
    assert_lake_matches(ing, expected)
    m = load_manifest(lake_dir)
    assert m is not None and m.epoch == 1
    assert all(st.applied_lsn >= 0 for st in m.partitions.values())


def test_multi_epoch(paths, expected, lake_dir):
    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest_in_epochs(ev, base, n_epochs=4)
    assert_lake_matches(ing, expected)
    assert ing.manifest.epoch == 4


def test_resume_from_checkpoint(paths, expected, lake_dir):
    """Stop after a mid-log checkpoint, open a fresh coordinator from the
    manifest, finish the log — identical to an uninterrupted run."""
    ev, base = paths
    from tapdata_connectors_ray.fixtures import parquet_num_rows
    mid = parquet_num_rows(ev)  # any LSN inside the log works
    ing1 = CheckpointedIngest(lake_dir, num_partitions=16)
    ing1.ingest(ev, base, end_lsn=mid // 2)
    del ing1
    ing2 = CheckpointedIngest(lake_dir, num_partitions=16)  # resumes manifest
    assert ing2.manifest.epoch == 1
    ing2.ingest(ev)
    assert_lake_matches(ing2, expected)


def test_crash_before_commit(paths, expected, lake_dir):
    """Data files written but manifest swap never happened: the lake must
    still converge on re-run (orphan files are invisible)."""
    ev, base = paths
    ing1 = CheckpointedIngest(lake_dir, num_partitions=16)
    ing1.ingest(ev, base, end_lsn=5000, commit=False)
    assert load_manifest(lake_dir) is None  # nothing visible committed
    ing2 = CheckpointedIngest(lake_dir, num_partitions=16)
    ing2.ingest(ev, base)
    assert_lake_matches(ing2, expected)


def test_reingest_is_noop(paths, expected, lake_dir):
    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest(ev, base)
    rows_before = ing.metrics()["rows"]
    m = ing.ingest(ev, base)  # full log again — everything below watermark
    assert ing.metrics()["rows"] == rows_before
    assert_lake_matches(ing, expected)
    assert m.epoch == 2


def test_point_lookup_and_metrics(paths, expected, lake_dir):
    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest(ev, base)
    exp = expected.to_pylist()
    probe = exp[len(exp) // 2]
    got = ing.query_by_key(probe["conv_id"], probe["turn_idx"])
    assert got is not None and got["text"] == probe["text"]
    assert ing.query_by_key("conv-does-not-exist", 0) is None
    m = ing.metrics()
    assert m["rows"] == len(exp)
    assert m["schema_version"] == 5


def test_live_tailer_resume(paths, expected, tmp_path):
    """Tailer crash/restart between waves: a fresh LogTailer reopens the
    persisted file offset + manifest and continues exactly."""
    import os
    import shutil

    from tapdata_connectors_ray.pipelines.livetail import LogTailer

    ev, base = paths
    segs = sorted(f for f in os.listdir(ev) if f.endswith(".parquet"))
    staging = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    os.makedirs(staging)
    half = max(len(segs) // 2, 1)

    t1 = LogTailer(staging, lake, num_partitions=16)
    for s in segs[:half]:
        shutil.copy2(os.path.join(ev, s), os.path.join(staging, s))
    assert t1.poll_once(base) == half
    del t1

    t2 = LogTailer(staging, lake, num_partitions=16)  # reopen from disk
    assert t2.poll_once() == 0  # nothing new yet
    for s in segs[half:]:
        shutil.copy2(os.path.join(ev, s), os.path.join(staging, s))
    assert t2.poll_once() == len(segs) - half
    assert_lake_matches(t2.ingest, expected)


def test_delta_ingest_read_before_and_after_compaction(paths, expected, lake_dir):
    """Delta epochs stack files (tombstones retained); reads collapse the
    stack; compaction rewrites to one file per partition — state identical
    at every step, point lookups included."""
    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest_in_epochs(ev, base, n_epochs=3, mode="delta")
    assert max(len(st.files) for st in ing.manifest.partitions.values()) > 1
    assert_lake_matches(ing, expected)  # read-time stack collapse

    exp_df = expected.to_pandas()
    probe = exp_df.iloc[len(exp_df) // 2]
    row = ing.query_by_key(probe["conv_id"], int(probe["turn_idx"]))
    assert row is not None and row["text"] == probe["text"]

    ing.compact()
    assert all(len(st.files) == 1 for st in ing.manifest.partitions.values())
    assert_lake_matches(ing, expected)  # identical after major compaction

    # a deleted key must stay deleted through the delta stack
    live_keys = set(zip(exp_df["conv_id"], exp_df["turn_idx"].astype(int)))
    import pyarrow.parquet as pq

    all_keys = set(
        zip(
            pq.read_table(ev, columns=["conv_id"]).column(0).to_pylist(),
            [int(x) if x is not None else -1
             for x in pq.read_table(ev, columns=["turn_idx"]).column(0).to_pylist()],
        )
    )
    deleted = next(iter(k for k in all_keys if k not in live_keys and k[1] >= 0), None)
    if deleted is not None:
        assert ing.query_by_key(deleted[0], deleted[1]) is None


def test_resupplied_base_does_not_resurrect(ray_session, smoke_fixture_dir, tmp_path):
    """Live-tail restart hazard (round-1 advisor finding): a resumed job
    re-supplies the base snapshot together with only the newest log wave,
    with event-side watermark filtering off.  Keys whose tombstones were
    compacted away must NOT come back — the base path keeps its
    partition-watermark resurrection guard independently."""
    import os

    import pandas as pd

    from tapdata_connectors_ray.pipelines.incremental import CheckpointedIngest

    ev = smoke_fixture_dir + "/events.parquet"
    base = smoke_fixture_dir + "/transcripts.parquet"
    lake = str(tmp_path / "lake")

    ing = CheckpointedIngest(lake, num_partitions=16)
    ing.ingest(ev, base)
    expected = ing.final_dataset().to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )

    # restart: base re-supplied alongside just the last segment, watermarks off
    last_seg = sorted(
        os.path.join(ev, f) for f in os.listdir(ev) if f.endswith(".parquet")
    )[-1]
    resumed = CheckpointedIngest(lake, num_partitions=16)
    resumed.ingest([last_seg], base, use_watermarks=False)
    got = resumed.final_dataset().to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, expected)


def test_transient_sink_failure_retried(paths, expected, lake_dir, tmp_path):
    """Reference retry semantics (retryable-exception classification +
    retry, ConnectorBase.java:391-406): a transient I/O error in a partition
    write is retried at the TASK level and the retried task converges to
    the identical lake state (idempotent file name + atomic rename).  The
    injector trips exactly once per partition via marker files shared
    across workers.  Tripping partitions are capped BELOW the retry budget
    (SINK_MAX_RETRIES): map_groups may pack several groups into one task,
    and each trip inside a task consumes one task-level retry — more
    trippers than retries would exhaust the budget nondeterministically
    depending on group-to-task packing."""
    import os

    from tapdata_connectors_ray.pipelines.incremental import (
        SINK_MAX_RETRIES,
        CheckpointedIngest,
    )

    ev, base = paths
    marker_dir = str(tmp_path / "faults")
    os.makedirs(marker_dir, exist_ok=True)
    trippers = tuple(range(0, 3 * (SINK_MAX_RETRIES - 1), 3))  # 0,3,6 for budget 4

    def fail_once(pid: int, _dir=marker_dir, _trip=trippers) -> None:
        marker = os.path.join(_dir, f"p{pid}")
        if pid in _trip and not os.path.exists(marker):
            open(marker, "w").close()
            raise OSError(f"injected transient sink failure on partition {pid}")

    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest(ev, base, fault_injector=fail_once)
    assert_lake_matches(ing, expected)
    # every tripping partition tripped exactly once
    tripped = tuple(sorted(int(f[1:]) for f in os.listdir(marker_dir)))
    assert tripped == trippers


def test_nonretryable_sink_failure_fails_fast(paths, lake_dir):
    """A non-I/O error is NOT retried (fail-fast classification) and no
    manifest commit happens — the lake stays absent/unchanged."""
    from tapdata_connectors_ray.pipelines.incremental import CheckpointedIngest
    from tapdata_connectors_ray.state.checkpoint import load_manifest

    ev, base = paths

    def always_fail(pid: int) -> None:
        raise ValueError("permanent decode bug")

    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    with pytest.raises(Exception):
        ing.ingest(ev, base, fault_injector=always_fail)
    assert load_manifest(lake_dir) is None


def test_minor_compaction_bounds_file_count(paths, expected, lake_dir):
    """Minor compaction collapses the DELTA stack only (tombstones retained,
    base file untouched): file count per partition drops to <= 2 (base +
    one merged delta), state identical before/after, deletes stay dead, and
    a later MAJOR compaction still lands at one file per partition."""
    import os

    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest_in_epochs(ev, base, n_epochs=4, mode="delta")
    before = {p: list(st.files) for p, st in ing.manifest.partitions.items()}
    assert max(len(f) for f in before.values()) >= 3

    ing.compact_minor()
    for pid, st in ing.manifest.partitions.items():
        deltas = [f for f in st.files if os.path.basename(f).startswith("delta-")]
        assert len(deltas) <= 1, f"partition {pid} still stacked: {st.files}"
        # base/compacted files untouched
        kept = [f for f in before[pid] if not os.path.basename(f).startswith("delta-")]
        assert [f for f in st.files if not os.path.basename(f).startswith("delta-")] == kept
    assert_lake_matches(ing, expected)

    # tombstones must have survived the minor merge: major compaction after
    # it still yields the same live set (no resurrection)
    ing.compact()
    assert all(len(st.files) == 1 for st in ing.manifest.partitions.values())
    assert_lake_matches(ing, expected)


def test_time_travel_reads_earlier_commit(paths, expected, lake_dir):
    """Each commit snapshots its manifest; dataset_at(epoch) reproduces the
    lake exactly as committed then — including schema version (a read at an
    epoch before a DDL shows the OLD schema)."""
    from tapdata_connectors_ray.pipelines.replay import lsn_bounds
    from tapdata_connectors_ray.state.checkpoint import committed_epochs

    ev, base = paths
    _, hi = lsn_bounds(ev)
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    m1 = ing.ingest(ev, base, end_lsn=hi // 2)
    ing.ingest(ev, None, end_lsn=hi)
    assert committed_epochs(lake_dir) == [m1.epoch, m1.epoch + 1]

    # as-of the first commit: exactly the half-log state (old schema: the
    # rename DDL at 50% may or may not be in depending on the integer cut —
    # recompute from the manifest's own plan)
    at1 = ing.dataset_at(m1.epoch).to_pandas()
    from tapdata_connectors_ray.oracle import expected_final_state
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    ev_t = pq.read_table(ev)
    half = ev_t.filter(pc.less_equal(ev_t["lsn"], hi // 2))
    exp1 = expected_final_state(pq.read_table(base), half).to_pandas()
    assert len(at1) == len(exp1)
    # the as-of read surfaces the schema IN EFFECT at that commit (the
    # rename DDL at 50% is past the hi//2 integer cut -> pre-rename names),
    # while the oracle reducer always emits the latest schema
    from tapdata_connectors_ray.state.checkpoint import load_manifest_at

    plan1 = ing.committed_plan(load_manifest_at(lake_dir, m1.epoch))
    assert sorted(at1.columns) == sorted(plan1.schema_at().names)
    assert set(zip(at1["conv_id"], at1["turn_idx"].astype(int))) == set(
        zip(exp1["conv_id"], exp1["turn_idx"].astype(int))
    )

    # latest read unchanged by history
    assert_lake_matches(ing, expected)


def test_partition_resync_rebuilds_only_reset_partition(paths, expected, lake_dir):
    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest(ev, base)
    files_before = {p: list(st.files) for p, st in ing.manifest.partitions.items()}
    ing.resync_partition(3, ev, base)
    for pid, st in ing.manifest.partitions.items():
        if pid == 3:
            assert st.files != files_before[pid]
        else:
            assert st.files == files_before[pid], f"partition {pid} was touched"
    assert_lake_matches(ing, expected)


def test_concurrent_writer_fencing(paths, lake_dir):
    """Optimistic concurrency: a writer holding a stale manifest must get a
    ManifestConflictError at commit (its data files stay invisible orphans);
    after reloading it can proceed."""
    import pytest as _pytest

    from tapdata_connectors_ray.state.checkpoint import ManifestConflictError

    ev, base = paths
    a = CheckpointedIngest(lake_dir, num_partitions=8)
    b = CheckpointedIngest(lake_dir, num_partitions=8)  # loads the same (empty) state
    a.ingest(ev, base)  # epoch 1 committed
    with _pytest.raises(ManifestConflictError):
        b.ingest(ev, base)  # stale: still thinks epoch 0
    # reload -> watermarks now cover the log -> idempotent no-op epoch works
    b2 = CheckpointedIngest(lake_dir, num_partitions=8)
    b2.ingest(ev, None)
    assert b2.manifest.epoch == 2


def test_resync_repairs_corrupt_partition(paths, expected, lake_dir):
    """Disk corruption in one partition's file: reads fail loudly, and
    resync_partition is the repair path — rebuilt from snapshot + log."""
    import os

    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=8)
    ing.ingest(ev, base)
    victim = 5
    f = ing.manifest.partitions[victim].files[0]
    with open(f, "wb") as fh:
        fh.write(b"not a parquet file")
    with pytest.raises(Exception):
        ing.final_dataset().to_pandas()
    ing.resync_partition(victim, ev, base)
    assert_lake_matches(ing, expected)


def test_mv_refreshes_only_touched_partitions(paths, expected, lake_dir):
    """Epoch 2 touches a subset of partitions; update_mv must rewrite only
    those MV files, and the final MV equals the aggregate over the lake."""
    import os

    from tapdata_connectors_ray.pipelines.replay import lsn_bounds

    ev, base = paths
    _, hi = lsn_bounds(ev)
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest(ev, base, end_lsn=hi // 2)
    first = set(ing.update_mv())
    assert first  # every partition with data refreshed once
    mv_dir = os.path.join(lake_dir, "mv", "conv_stats")
    mtimes = {f: os.path.getmtime(os.path.join(mv_dir, f)) for f in os.listdir(mv_dir)}

    ing.ingest(ev, None, end_lsn=hi)
    second = set(ing.update_mv())
    for f, m in mtimes.items():
        pid = int(f.split("=")[1].split(".")[0])
        changed = os.path.getmtime(os.path.join(mv_dir, f)) != m
        assert changed == (pid in second), f"{f} rewrite mismatch"

    # idempotent: nothing stale now
    assert ing.update_mv() == []

    mv = ing.mv_dataset().to_pandas().sort_values("conv_id", ignore_index=True)
    exp = (
        expected.to_pandas()
        .groupby("conv_id")
        .agg(n_rows=("conv_id", "size"), sum_val=("turn_score", "sum"))
        .reset_index()
        .sort_values("conv_id", ignore_index=True)
    )
    assert mv["n_rows"].tolist() == exp["n_rows"].tolist()
    assert mv["sum_val"].astype("Int64").tolist() == exp["sum_val"].astype("Int64").tolist()


def test_stale_lock_reclaimed(tmp_path):
    """A crashed writer's leftover manifest.lock must be reclaimed after the
    retry window: the next fenced commit acquires the lock (mutual exclusion
    restored) and removes the stale file, instead of silently running
    unfenced forever."""
    import os
    import time

    from tapdata_connectors_ray.state.checkpoint import (
        Manifest,
        commit_manifest,
        load_manifest,
    )

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    stale = os.path.join(lake, "manifest.lock")
    with open(stale, "w"):
        pass
    old = time.time() - 60
    os.utime(stale, (old, old))  # crashed 60 s ago
    m = Manifest(num_partitions=4, epoch=1)
    commit_manifest(lake, m, expected_epoch=0)
    assert load_manifest(lake).epoch == 1
    assert not os.path.exists(stale), "stale lock left in place"


def test_rate_controlled_soak(paths, expected, tmp_path):
    """Rate-controlled live-tail soak (the dummy connector's Rate.java
    throttled generator feeding the tailer): a token-budget producer emits
    the log in >=3 timed waves; after EVERY poll the tailer is fully caught
    up (applied-LSN == produced head — bounded lag) and the source-clock
    watermark advances monotonically; the final lake equals the one-shot
    replay."""
    import pyarrow.compute as pc

    from tapdata_connectors_ray.fixtures import RateControlledProducer
    from tapdata_connectors_ray.pipelines.livetail import LogTailer

    ev, base = paths
    events = pq.read_table(ev)
    n = events.num_rows

    clock_now = [0.0]
    prod = RateControlledProducer(
        events, str(tmp_path / "log"), events_per_sec=n / 4.0,
        clock=lambda: clock_now[0],
    )
    assert prod.due() == 0 and prod.produce_wave() == 0  # throttled at t=0

    tailer = LogTailer(str(tmp_path / "log"), str(tmp_path / "lake"),
                       num_partitions=16)
    waves = 0
    last_wm, last_lsn = -1, -1
    while not prod.exhausted:
        clock_now[0] += 1.0
        emitted = prod.produce_wave()
        assert 0 < emitted <= int(n / 4.0) + 1, "rate budget violated"
        assert tailer.poll_once(base if waves == 0 else None) == 1
        waves += 1
        m = tailer.ingest.metrics()
        produced = prod.events.slice(0, prod.emitted)  # producer emits LSN-ordered
        head = pc.max(produced["lsn"]).as_py()
        assert m["applied_lsn_max"] == head, "tailer lagging behind producer"
        assert m["watermark_ts_max"] >= last_wm
        assert m["applied_lsn_max"] > last_lsn
        last_wm, last_lsn = m["watermark_ts_max"], m["applied_lsn_max"]
    assert waves >= 3
    assert prod.due() == 0
    assert_lake_matches(tailer.ingest, expected)


def test_fencing_under_memory_storage(tmp_path):
    """The commit/fence protocol runs entirely on the FileStorage SPI:
    under MemoryFileStorage (no O_EXCL, no rename, no fsync) the epoch CAS
    still fences a stale writer, history snapshots land, and time-travel
    loads — proving no hidden POSIX dependency in the commit path."""
    import pytest as _pytest

    from tapdata_connectors_ray.sources.storage import MemoryFileStorage
    from tapdata_connectors_ray.state.checkpoint import (
        Manifest,
        ManifestConflictError,
        commit_manifest,
        committed_epochs,
        load_manifest,
        load_manifest_at,
    )

    mem = MemoryFileStorage()
    lake = str(tmp_path / "lake")
    m1 = Manifest(num_partitions=4, epoch=1)
    commit_manifest(lake, m1, expected_epoch=0, storage=mem)
    assert load_manifest(lake, storage=mem).epoch == 1
    # stale writer (still thinks epoch 0) must be fenced
    with _pytest.raises(ManifestConflictError):
        commit_manifest(lake, Manifest(num_partitions=4, epoch=1),
                        expected_epoch=0, storage=mem)
    # the loser's failed attempt released the lock: a reloaded writer commits
    m2 = Manifest(num_partitions=4, epoch=2)
    commit_manifest(lake, m2, expected_epoch=1, storage=mem)
    assert committed_epochs(lake, storage=mem) == [1, 2]
    assert load_manifest_at(lake, 1, storage=mem).epoch == 1
    # nothing leaked onto the real filesystem
    import os as _os
    assert not _os.path.exists(_os.path.join(lake, "manifest.json"))


def test_atomic_put_parquet_backends(tmp_path):
    """The lake writers' single write primitive round-trips through both
    backends (LOCAL fast path and buffer+PUT), metadata included."""
    import pyarrow as pa

    from tapdata_connectors_ray.sources.storage import (
        LOCAL,
        MemoryFileStorage,
        atomic_put_parquet,
        read_parquet_table,
    )

    t = pa.table({"a": [1, 2, 3]}).replace_schema_metadata({"last_epoch": "7"})
    p_local = str(tmp_path / "x" / "t.parquet")
    atomic_put_parquet(t, p_local)
    got = read_parquet_table(p_local, LOCAL)
    assert got.equals(t.replace_schema_metadata(got.schema.metadata))
    assert got.schema.metadata[b"last_epoch"] == b"7"
    mem = MemoryFileStorage()
    atomic_put_parquet(t, "/mock/t.parquet", storage=mem)
    got2 = read_parquet_table("/mock/t.parquet", mem)
    assert got2["a"].to_pylist() == [1, 2, 3]
    assert got2.schema.metadata[b"last_epoch"] == b"7"
    # put_if_absent is the mutual-exclusion primitive on both backends
    assert mem.put_if_absent("/mock/lock", b"") is True
    assert mem.put_if_absent("/mock/lock", b"") is False
    assert LOCAL.put_if_absent(str(tmp_path / "lock"), b"") is True
    assert LOCAL.put_if_absent(str(tmp_path / "lock"), b"") is False


def test_vacuum_gc_and_retention(paths, expected, lake_dir):
    """Lake vacuum: superseded rewrite files + crashed-writer orphans are
    collected, history retention is honored, the latest state and retained
    time travel survive, vacuumed epochs become unreadable."""
    import os

    from tapdata_connectors_ray.fixtures import parquet_num_rows
    from tapdata_connectors_ray.state.checkpoint import committed_epochs

    ev, base = paths
    mid = parquet_num_rows(ev)
    ing = CheckpointedIngest(lake_dir, num_partitions=8)
    ing.ingest(ev, base, end_lsn=mid // 3)      # epoch 1 (rewrite mode)
    ing.ingest(ev, None, end_lsn=2 * mid // 3)  # epoch 2 rewrites -> ep-1 files orphaned
    ing.ingest(ev, None)                        # epoch 3
    # a crashed writer's stray tmp part
    stray = os.path.join(lake_dir, "partitions", "p=00003",
                         "part-999999.parquet.tmp-deadbeef")
    with open(stray, "wb") as f:
        f.write(b"junk")
    assert committed_epochs(lake_dir) == [1, 2, 3]
    old_files = {
        f for st in ing.manifest.partitions.values() for f in st.files
    }
    res = ing.vacuum(retain_last=1)
    assert res["removed_history"] == 2           # epochs 1 and 2 dropped
    assert res["removed_files"] > 0
    assert not os.path.exists(stray)
    assert committed_epochs(lake_dir) == [3]
    # current state intact, current files untouched
    assert_lake_matches(ing, expected)
    assert all(os.path.exists(f) for f in old_files)
    # retained epoch still time-travels; vacuumed epoch raises
    assert ing.dataset_at(3).count() > 0
    with pytest.raises(ValueError):
        ing.dataset_at(1)


def test_mv_declarative_spec_matches_pandas(paths, lake_dir):
    """Random declarative MV specs: the Arrow TableGroupBy refresh equals a
    pandas groupby twin over the final lake state, for every op kind."""
    import numpy as np

    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest(ev, base)
    rng = np.random.default_rng(3)
    num_cols = ["turn_idx", "turn_score"]
    for trial in range(3):
        aggs = [{"op": "count", "col": None, "alias": "n_rows"}]
        for i, op in enumerate(rng.choice(["sum", "min", "max"], size=3)):
            aggs.append({"op": str(op), "col": str(rng.choice(num_cols)), "alias": f"a{i}"})
        name = f"view{trial}"
        ing.define_mv(name, aggs)
        ing.update_mv(name)
        got = (
            ing.mv_dataset(name).to_pandas().sort_values("conv_id", ignore_index=True)
        )
        final = ing.final_dataset().to_pandas()
        g = final.groupby("conv_id", sort=True)
        exp = pd.DataFrame({"conv_id": sorted(final["conv_id"].unique())})
        exp["n_rows"] = g.size().to_numpy()
        for a in aggs[1:]:
            exp[a["alias"]] = getattr(g[a["col"]], a["op"])().to_numpy()
        got = got[exp.columns.tolist()]
        for c in exp.columns:
            if c == "conv_id":
                continue
            assert np.allclose(
                got[c].astype("float64"), exp[c].astype("float64"), equal_nan=True
            ), (name, c)

    # spec validation
    with pytest.raises(ValueError):
        ing.define_mv("bad", [{"op": "median", "col": "turn_score", "alias": "x"}])
    with pytest.raises(ValueError):
        ing.define_mv("bad2", [{"op": "sum", "col": None, "alias": "x"}])


def test_push_tail_soak_bounded_lag(paths, expected, tmp_path):
    """PUSH-based live tail (no directory polling): a generator ACTOR
    rate-pushes the log into the receiver's bounded queue; after every
    consume the tailer is fully caught up (applied-LSN == pushed head AND
    zero waves queued — bounded lag), and the final lake equals both the
    one-shot replay and the POLLING tailer over the same event stream."""
    import ray as _ray

    from tapdata_connectors_ray.fixtures import RateControlledProducer
    from tapdata_connectors_ray.pipelines.livetail import (
        LogTailer,
        PushProducer,
        PushReceiver,
        PushTailer,
    )

    ev, base = paths
    events = pq.read_table(ev)
    n = events.num_rows

    receiver = PushReceiver.remote(max_waves=8)
    producer = PushProducer.remote(events, receiver, events_per_sec=n / 4.0)
    tailer = PushTailer(receiver, str(tmp_path / "lake_push"), num_partitions=16)

    waves = 0
    while not _ray.get(producer.exhausted.remote()):
        assert _ray.get(producer.step.remote(1.0)) > 0
        assert tailer.consume_once(base if waves == 0 else None) >= 1
        waves += 1
        head = _ray.get(producer.emitted_head_lsn.remote())
        m = tailer.ingest.metrics()
        assert m["applied_lsn_max"] == head, "push tailer lagging behind producer"
        assert tailer.lag_waves() == 0, "waves stuck in the receiver queue"
    assert waves >= 3
    assert tailer.consume_once() == 0  # idle consume is a no-op
    assert_lake_matches(tailer.ingest, expected)

    # polling path over the SAME stream must land the identical final state
    clock_now = [0.0]
    prod = RateControlledProducer(
        events, str(tmp_path / "log"), events_per_sec=n / 4.0,
        clock=lambda: clock_now[0],
    )
    poll_tailer = LogTailer(str(tmp_path / "log"), str(tmp_path / "lake_poll"),
                            num_partitions=16)
    first = True
    while not prod.exhausted:
        clock_now[0] += 1.0
        prod.produce_wave()
        poll_tailer.poll_once(base if first else None)
        first = False
    pd.testing.assert_frame_equal(
        _as_sorted_df(tailer.final_dataset()),
        _as_sorted_df(poll_tailer.final_dataset()),
    )


def test_push_tail_backpressure_and_crash_recovery(paths, expected, tmp_path):
    """A full receiver queue REJECTS the push (bounded memory — backpressure,
    nothing dropped); a crash after spool-to-inbox but before the manifest
    commit re-applies the wave on reopen (the applied-wave offset advances
    only after the epoch commit, the polling tailer\'s exact contract)."""
    import pyarrow as pa
    import ray as _ray

    from tapdata_connectors_ray.pipelines.livetail import PushReceiver, PushTailer

    ev, base = paths
    # pushed waves arrive in stream (LSN) order — the producer's contract;
    # a row's interpreting DDL always lands in or before the row's own wave
    events = pq.read_table(ev).sort_by("lsn")
    half = events.num_rows // 2

    # backpressure: a max_waves=2 queue takes two pushes, rejects the third
    bp = PushReceiver.remote(max_waves=2)
    tiny = pa.table({"x": [1]})
    assert _ray.get(bp.push.remote(tiny)) == 0
    assert _ray.get(bp.push.remote(tiny)) == 1
    assert _ray.get(bp.push.remote(tiny)) == -1  # full: rejected, not dropped
    assert _ray.get(bp.pending.remote()) == 2

    # crash drill on the real stream: wave 0 applies; wave 1 is drained and
    # SPOOLED to the durable inbox, then the tailer dies before the commit
    receiver = PushReceiver.remote(max_waves=4)
    lake = str(tmp_path / "lake")
    assert _ray.get(receiver.push.remote(events.slice(0, half))) == 0
    tailer = PushTailer(receiver, lake, num_partitions=16)
    assert tailer.consume_once(base) == 1
    applied = tailer.applied_wave

    wid1 = _ray.get(receiver.push.remote(events.slice(half)))
    spooled = tailer._spool(_ray.get(receiver.drain.remote()))
    assert [w for w, _ in spooled] == [wid1]
    del tailer  # crash: wave 1 spooled but never applied

    tailer2 = PushTailer(receiver, lake, num_partitions=16)  # recovery opens
    assert tailer2.applied_wave == wid1  # _recover re-applied the inbox wave
    assert tailer2.applied_wave > applied
    assert_lake_matches(tailer2.ingest, expected)

    # a RE-DRAIN of an already-applied wave id is dropped at the spool gate
    assert tailer2._spool([(wid1, events.slice(half))]) == []


def test_push_tail_crash_windows_lose_nothing(paths, expected, tmp_path):
    """The two narrow crash windows around the spool must lose nothing:
    (a) between peek and ack the wave is still in the receiver queue (peek
    is non-destructive), and (b) after spool+ack but before the FIRST epoch
    commit, recovery DEFERS the inbox wave so it applies together with the
    caller's base snapshot instead of orphaning the base forever."""
    import ray as _ray

    from tapdata_connectors_ray.pipelines.livetail import PushReceiver, PushTailer

    ev, base = paths
    events = pq.read_table(ev).sort_by("lsn")
    half = events.num_rows // 2

    # (a) crash between peek and spool: wave stays queued, fresh consume wins
    receiver = PushReceiver.remote(max_waves=4)
    lake = str(tmp_path / "lake_a")
    assert _ray.get(receiver.push.remote(events.slice(0, half))) == 0
    t = PushTailer(receiver, lake, num_partitions=16)
    assert len(_ray.get(receiver.peek.remote(16))) == 1  # "crashed" mid-consume
    assert _ray.get(receiver.pending.remote()) == 1  # still queued — not lost
    assert t.consume_once(base) == 1
    _ray.get(receiver.push.remote(events.slice(half)))
    assert t.consume_once() == 1
    assert_lake_matches(t.ingest, expected)

    # (b) crash after spool+ack, BEFORE the first-ever commit (offset = -1)
    receiver2 = PushReceiver.remote(max_waves=4)
    lake2 = str(tmp_path / "lake_b")
    assert _ray.get(receiver2.push.remote(events.slice(0, half))) == 0
    t1 = PushTailer(receiver2, lake2, num_partitions=16)
    waves = _ray.get(receiver2.peek.remote(16))
    assert [w for w, _ in t1._spool(waves)] == [0]
    _ray.get(receiver2.ack.remote(0))
    del t1  # crash: wave 0 durably spooled + acked, never applied

    t2 = PushTailer(receiver2, lake2, num_partitions=16)
    assert t2.applied_wave == -1  # recovery deferred rather than committing
    assert t2.consume_once(base) == 1  # wave 0 applies WITH the base snapshot
    _ray.get(receiver2.push.remote(events.slice(half)))
    assert t2.consume_once() == 1
    assert_lake_matches(t2.ingest, expected)


def test_forget_keys_rewrites_only_affected_partitions(
    ray_session, paths, expected, lake_dir
):
    """Retention delete: (a) result == final state minus the forgotten
    conversations; (b) partitions no forgotten key hashes to keep their
    EXACT file lists (the rewrite is hash-pruned, not a lake scan);
    (c) the forget lands as its own epoch with lineage, and vacuum erases
    the superseded files."""
    import os

    from tapdata_connectors_ray.functions.hashing import partition_ids

    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest(ev, base)
    before = {pid: list(st.files) for pid, st in ing.manifest.partitions.items()}
    epoch_before = ing.manifest.epoch

    forget = [f"conv-{i:08d}" for i in range(5, 400, 37)]
    m = ing.forget_keys(forget)
    assert m.epoch == epoch_before + 1

    affected = set(partition_ids(pd.Series(forget).to_numpy(), 16).tolist())
    for pid, files in before.items():
        st = m.partitions[pid]
        if pid in affected:
            assert list(st.files) != files
            assert st.lineage.get("retention_epoch") == m.epoch
        else:
            assert list(st.files) == files

    got = ing.final_dataset().to_pandas()
    assert not got["conv_id"].isin(set(forget)).any()
    exp = expected.to_pandas()
    exp = exp[~exp["conv_id"].isin(set(forget))]
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got["turn_score"] = got["turn_score"].astype("Int64")
    exp["turn_score"] = exp["turn_score"].astype("Int64")
    pd.testing.assert_frame_equal(got[exp.columns], exp)

    # idempotent: forgetting the same keys again is a no-op commit-wise
    m2 = ing.forget_keys(forget)
    assert m2.epoch == m.epoch + 1  # rewrite still commits (files existed)

    # superseded pre-forget files are GC'd at latest; vacuum purges history
    ing.vacuum(retain_last=1)
    live = set(ing.manifest.all_files())
    for pid in affected:
        for f in before[pid]:
            assert f not in live
            assert not os.path.exists(f)


def test_changes_between_epochs_matches_log_cdf(ray_session, paths, lake_dir):
    """The lake-native CDF (manifest diff over committed epochs) must equal
    the log-based CDF at the same LSN cut, bit for bit; and a diff across a
    retention-forget epoch yields exactly the forgotten rows as deletes
    while pruning every unaffected partition from the read set."""
    from tapdata_connectors_ray.functions.hashing import partition_ids
    from tapdata_connectors_ray.pipelines.replay import change_data_feed, lsn_bounds

    ev, base = paths
    _, hi = lsn_bounds(ev)
    cut = hi * 23 // 25
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    m1 = ing.ingest(ev, base, end_lsn=cut)
    ing.ingest(ev, None)

    def norm(df):
        df = df.sort_values(["conv_id", "turn_idx", "op_cdf"]).reset_index(drop=True)
        df["turn_score"] = df["turn_score"].astype("Int64")
        df["turn_idx"] = df["turn_idx"].astype("Int64")
        return df

    got = norm(ing.changes_between(m1.epoch).to_pandas())
    want = norm(change_data_feed(ev, base, from_lsn=cut, num_partitions=16).to_pandas())
    pd.testing.assert_frame_equal(got[want.columns], want)

    # forget epoch: pruning is structural — the diff's changed-partition set
    # (file-list comparison between the two manifests, the implementation's
    # own rule) must equal exactly the partitions the forgotten keys hash
    # to, a proper subset of the lake
    pre_manifest = ing.manifest
    state_before = ing.final_dataset().to_pandas()
    forget = sorted(state_before["conv_id"].unique()[:7])
    m3 = ing.forget_keys(list(forget))
    affected = set(partition_ids(pd.Series(list(forget)).to_numpy(), 16).tolist())
    changed = {
        pid for pid in m3.partitions
        if list(m3.partitions[pid].files) != list(pre_manifest.partitions[pid].files)
    }
    assert changed == affected
    assert changed < set(m3.partitions)  # genuinely pruned, not all-touched

    # erasure beats history: the superseded pre-forget files are GC'd at
    # commit, so a CDF crossing a retention epoch fails loudly rather than
    # resurrecting the forgotten subjects' pre-images
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        ing.changes_between(pre_manifest.epoch).to_pandas()
    blob = str(ei.value) + str(getattr(ei.value, "cause", "")) + str(ei.value.__cause__)
    assert "erased by a later" in blob or "FileNotFound" in blob


def test_scd2_incremental_equals_batch_and_is_idempotent(ray_session, paths, lake_dir):
    """Epoch-ledgered SCD2: (a) the 3-epoch incremental read-back equals the
    one-shot batch scd2_history bit for bit; (b) re-applying the last epoch
    (duplicate delivery / crash-retry) changes nothing — the watermark drop
    makes the apply idempotent; (c) hist files are append-only (earlier
    epochs' hist files survive verbatim in the manifest)."""
    from tapdata_connectors_ray.pipelines.replay import lsn_bounds, scd2_history

    ev, base = paths
    _, hi = lsn_bounds(ev)
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    for i, frac in enumerate((1, 2, 3)):
        ing.scd2_apply_epoch(ev, base if i == 0 else None, end_lsn=hi * frac // 3)

    def norm(df):
        df = df.sort_values(["conv_id", "turn_idx", "valid_from"]).reset_index(drop=True)
        df["turn_score"] = df["turn_score"].astype("Int64")
        df["turn_idx"] = df["turn_idx"].astype("Int64")
        df["valid_to"] = df["valid_to"].astype("Int64")
        return df

    got = norm(ing.scd2_dataset().to_pandas())
    want = norm(scd2_history(ev, base, num_partitions=16).to_pandas())
    pd.testing.assert_frame_equal(got[want.columns], want)

    hist_before = {
        pid: sorted(f for f in st.files if "hist-" in f)
        for pid, st in ing.manifest.partitions.items()
    }
    ing.scd2_apply_epoch(ev, None, end_lsn=hi)  # duplicate re-delivery
    again = norm(ing.scd2_dataset().to_pandas())
    pd.testing.assert_frame_equal(again[want.columns], want)
    for pid, hists in hist_before.items():
        kept = [f for f in ing.manifest.partitions[pid].files if "hist-" in f]
        assert set(hists) <= set(kept)


def test_render_mv_refreshes_only_touched_partitions(ray_session, paths, lake_dir):
    """The rendered-transcript view refreshes exactly the partitions whose
    lineage advanced: a full ingest renders everything; a retention epoch
    touching a handful of partitions re-renders only those; view content
    always equals the one-shot fused render of the current state."""
    from tapdata_connectors_ray.functions.hashing import partition_ids
    from tapdata_connectors_ray.pipelines.replay import render_transcripts

    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest(ev, base)
    first = ing.update_render_mv()
    assert set(first) == {pid for pid, st in ing.manifest.partitions.items() if st.files}
    assert ing.update_render_mv() == []  # nothing stale -> no rewrite

    def norm(df):
        return df.sort_values("conv_id").reset_index(drop=True)

    got = norm(ing.render_mv_dataset().to_pandas())
    want = norm(render_transcripts(ev, base, num_partitions=16).to_pandas())
    pd.testing.assert_frame_equal(got[want.columns], want)

    forget = sorted(got["conv_id"].unique()[:5])
    ing.forget_keys(list(forget))
    second = ing.update_render_mv()
    affected = set(partition_ids(pd.Series(list(forget)).to_numpy(), 16).tolist())
    assert set(second) == affected and affected < set(first)
    after = norm(ing.render_mv_dataset().to_pandas())
    assert not after["conv_id"].isin(set(forget)).any()
    want_after = want[~want["conv_id"].isin(set(forget))].reset_index(drop=True)
    pd.testing.assert_frame_equal(after[want_after.columns], want_after)


def test_wap_red_audit_leaves_lake_unchanged(ray_session, paths, expected, lake_dir):
    """Write-audit-publish: a failing audit check must leave the committed
    lake byte-identical (staged files are invisible orphans vacuum can GC),
    and a later green retry re-stages from the unchanged watermarks and
    converges to the one-shot state."""
    from tapdata_connectors_ray.pipelines.replay import lsn_bounds

    ev, base = paths
    _, hi = lsn_bounds(ev)
    ing = CheckpointedIngest(lake_dir, num_partitions=16)
    ing.ingest(ev, base, end_lsn=hi // 2)
    before_epoch = ing.manifest.epoch
    before_state = _as_sorted_df(ing.final_dataset())

    def always_red(merged):
        return False, f"synthetic data-quality failure over {len(merged)} rows"

    m, audit = ing.ingest_audited(ev, None, checks=[always_red])
    assert not audit["published"]
    assert audit["failed_checks"] and audit["partitions_audited"] > 0
    assert m.epoch == before_epoch  # returned manifest is the OLD commit
    assert ing.manifest.epoch == before_epoch
    pd.testing.assert_frame_equal(_as_sorted_df(ing.final_dataset()), before_state)

    # a fresh coordinator sees the same committed state (nothing leaked)
    reopened = CheckpointedIngest(lake_dir, num_partitions=16)
    assert reopened.manifest.epoch == before_epoch

    # green retry: built-in invariants pass on real data and publish
    m2, audit2 = ing.ingest_audited(ev, None)
    assert audit2["published"] and audit2["dup_keys"] == 0 == audit2["key_nulls"]
    # the red attempt never committed, so the retry re-stages the SAME epoch
    # number (its atomic_put overwrites the red orphans deterministically)
    assert m2.epoch == before_epoch + 1
    assert_lake_matches(ing, expected)

    # staged orphans from the red attempt are GC'd by vacuum
    removed = ing.vacuum(retain_last=2)
    assert removed["removed_files"] >= 0  # no retained commit references them


def test_partition_split_is_local_and_resumable(ray_session, paths, expected, lake_dir):
    """Doubling the partition count must (a) keep every key inside its
    parent partition's child pair (split_from ≡ child mod old_P), (b)
    preserve state exactly, (c) inherit watermarks so a resumed ingest of
    the already-applied log is a no-op, and (d) leave point lookups working
    at the new width."""
    ev, base = paths
    ing = CheckpointedIngest(lake_dir, num_partitions=8)
    ing.ingest(ev, base)
    rows_before = ing.metrics()["rows"]

    m = ing.split_partitions(factor=2)
    assert m.num_partitions == 16
    for child, st in m.partitions.items():
        assert st.lineage["split_from"] == child % 8
    assert_lake_matches(ing, expected)

    resumed = CheckpointedIngest(lake_dir, num_partitions=16)
    resumed.ingest(ev, None)  # full log again — all below inherited watermarks
    assert resumed.metrics()["rows"] == rows_before
    assert_lake_matches(resumed, expected)

    exp = expected.to_pandas()
    probe = exp.iloc[len(exp) // 3]
    got = resumed.query_by_key(probe["conv_id"], int(probe["turn_idx"]))
    assert got is not None and got["text"] == probe["text"]
