"""Incrementally-maintained JOIN materialized view across two co-partitioned
CDC lakes (fact transcripts x dim conversations).

Pins (a) per-side partition-pruned refresh — a fact-only epoch refreshes
exactly the fact-touched partitions, a no-op refresh returns [], (b)
incremental == batch (3 asymmetric epochs equal a fresh one-shot view), and
(c) LEFT-join semantics — a conversation whose dim row was deleted keeps
NULL attributes.
"""

import os
import tempfile

import pandas as pd
import pytest

from tapdata_connectors_ray.fixtures import (
    CONVERSATIONS_SPEC,
    ensure_dim_fixtures,
    ensure_fixtures,
)
from tapdata_connectors_ray.pipelines.incremental import (
    CheckpointedIngest,
    JoinMaterializedView,
)
from tapdata_connectors_ray.pipelines.replay import lsn_bounds


@pytest.fixture(scope="module")
def paths():
    fact_dir = ensure_fixtures("sf0.001")
    dim_dir = ensure_dim_fixtures("sf0.001")
    return {
        "ev": os.path.join(fact_dir, "events.parquet"),
        "base": os.path.join(fact_dir, "transcripts.parquet"),
        "d_ev": os.path.join(dim_dir, "conv_events.parquet"),
        "d_base": os.path.join(dim_dir, "conv_base.parquet"),
    }


def _view_df(view: JoinMaterializedView) -> pd.DataFrame:
    df = view.dataset().to_pandas()
    return df.sort_values("conv_id").reset_index(drop=True)


def test_join_mv_incremental_equals_batch_and_prunes(paths):
    _, hi = lsn_bounds(paths["ev"])
    _, d_hi = lsn_bounds(paths["d_ev"])

    # incremental: 3 asymmetric epochs with a refresh after each
    f_lake = tempfile.mkdtemp(prefix="jmv_f_", dir="/tmp")
    d_lake = tempfile.mkdtemp(prefix="jmv_d_", dir="/tmp")
    fact = CheckpointedIngest(f_lake, num_partitions=16)
    dim = CheckpointedIngest(d_lake, num_partitions=16, spec=CONVERSATIONS_SPEC)
    view = JoinMaterializedView(tempfile.mkdtemp(prefix="jmv_v_", dir="/tmp"), fact, dim)

    fact.ingest(paths["ev"], paths["base"], end_lsn=hi // 2)
    dim.ingest(paths["d_ev"], paths["d_base"], end_lsn=d_hi // 2)
    r1 = view.refresh()
    assert r1, "first refresh must touch every populated partition"

    # fact-only epoch: the refresh set must be EXACTLY the partitions this
    # epoch touched on the fact side (dim lineage did not advance)
    before = {pid: st.lineage.get("epoch", -1) for pid, st in fact.manifest.partitions.items()}
    fact.ingest(paths["ev"], None)
    touched = {
        pid
        for pid, st in fact.manifest.partitions.items()
        if st.lineage.get("epoch", -1) != before.get(pid, -1)
    }
    r2 = view.refresh()
    assert set(r2) == touched
    # idempotent: nothing advanced -> no partition rewrites
    assert view.refresh() == []

    # dim-only epoch
    dim.ingest(paths["d_ev"], None)
    r3 = view.refresh()
    assert r3 and view.refresh() == []

    inc = _view_df(view)

    # batch twin: one-shot ingest of both full logs + a fresh view
    f2 = CheckpointedIngest(tempfile.mkdtemp(prefix="jmv_f2_", dir="/tmp"), num_partitions=16)
    d2 = CheckpointedIngest(
        tempfile.mkdtemp(prefix="jmv_d2_", dir="/tmp"), num_partitions=16,
        spec=CONVERSATIONS_SPEC,
    )
    view2 = JoinMaterializedView(tempfile.mkdtemp(prefix="jmv_v2_", dir="/tmp"), f2, d2)
    f2.ingest(paths["ev"], paths["base"])
    d2.ingest(paths["d_ev"], paths["d_base"])
    view2.refresh()
    batch = _view_df(view2)

    pd.testing.assert_frame_equal(inc, batch)

    # LEFT-join semantics: some convs live in fact but not in dim (the
    # fixture deletes ~6% of dim rows and never creates ~10%)
    assert inc["channel"].isna().any()
    assert len(inc) == inc["conv_id"].nunique()
    # joined rows carry real attributes
    assert inc["channel"].notna().any()


def test_join_mv_rejects_mispartitioned_lakes(paths):
    fact = CheckpointedIngest(tempfile.mkdtemp(prefix="jmv_x_", dir="/tmp"), num_partitions=16)
    dim = CheckpointedIngest(
        tempfile.mkdtemp(prefix="jmv_y_", dir="/tmp"), num_partitions=8,
        spec=CONVERSATIONS_SPEC,
    )
    with pytest.raises(ValueError, match="co-partitioning"):
        JoinMaterializedView(tempfile.mkdtemp(prefix="jmv_z_", dir="/tmp"), fact, dim)


def test_dim_retention_cascades_to_join_view(paths):
    """GDPR erasure on the DIMENSION lake must invalidate exactly the view
    partitions the forgotten keys hash to, and the re-joined rows lose
    their attributes (NULL channel/owner/priority) while the fact side
    lives on."""
    from tapdata_connectors_ray.functions.hashing import partition_ids

    fact = CheckpointedIngest(tempfile.mkdtemp(prefix="jmv_rf_", dir="/tmp"), num_partitions=16)
    dim = CheckpointedIngest(
        tempfile.mkdtemp(prefix="jmv_rd_", dir="/tmp"), num_partitions=16,
        spec=CONVERSATIONS_SPEC,
    )
    view = JoinMaterializedView(tempfile.mkdtemp(prefix="jmv_rv_", dir="/tmp"), fact, dim)
    fact.ingest(paths["ev"], paths["base"])
    dim.ingest(paths["d_ev"], paths["d_base"])
    view.refresh()

    df = _view_df(view)
    victims = df[df["channel"].notna()]["conv_id"].head(3).tolist()
    dim.forget_keys(victims)
    refreshed = view.refresh()
    expect = sorted(set(partition_ids(__import__("numpy").array(victims, object), 16).tolist()))
    assert refreshed == expect

    after = _view_df(view)
    hit = after[after["conv_id"].isin(victims)]
    assert len(hit) == len(victims)           # fact rows survive...
    assert hit["channel"].isna().all()        # ...dim attributes are gone
    assert hit["priority"].isna().all()
    # untouched conversations are byte-identical
    rest = after[~after["conv_id"].isin(victims)].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        rest, df[~df["conv_id"].isin(victims)].reset_index(drop=True)
    )


def test_rollup_matches_view_recompute(paths):
    """The cascaded per-channel rollup (two-level aggregate over refresh-task
    partials) equals a direct recompute from the join view's rows."""
    import numpy as np

    fact = CheckpointedIngest(tempfile.mkdtemp(prefix="jmv_uf_", dir="/tmp"), num_partitions=16)
    dim = CheckpointedIngest(
        tempfile.mkdtemp(prefix="jmv_ud_", dir="/tmp"), num_partitions=16,
        spec=CONVERSATIONS_SPEC,
    )
    view = JoinMaterializedView(tempfile.mkdtemp(prefix="jmv_uv_", dir="/tmp"), fact, dim)
    fact.ingest(paths["ev"], paths["base"])
    dim.ingest(paths["d_ev"], paths["d_base"])
    view.refresh()

    got = view.rollup()
    df = _view_df(view)
    want = (
        df.groupby("channel", dropna=False, sort=True)
        .agg(n_convs=("conv_id", "size"), sum_score_total=("sum_score", "sum"))
        .reset_index()
    )
    want["channel"] = want["channel"].astype(object).where(want["channel"].notna(), None)
    want["sum_score_total"] = want["sum_score_total"].fillna(0).astype(np.int64)
    want = want.sort_values("channel", na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype({"n_convs": np.int64}))


def test_join_view_survives_partition_split(paths):
    """Online partition-count growth (hash % 2P is partition-local) applied
    to BOTH lakes preserves co-partitioning: the re-opened view at the new
    width re-resolves (all partitions stale, since every lake file moved)
    and equals a batch twin built directly at 2P."""
    _, hi = lsn_bounds(paths["ev"])
    _, d_hi = lsn_bounds(paths["d_ev"])
    f_dir = tempfile.mkdtemp(prefix="jmv_pf_", dir="/tmp")
    d_dir = tempfile.mkdtemp(prefix="jmv_pd_", dir="/tmp")
    v_dir = tempfile.mkdtemp(prefix="jmv_pv_", dir="/tmp")

    fact = CheckpointedIngest(f_dir, num_partitions=8)
    dim = CheckpointedIngest(d_dir, num_partitions=8, spec=CONVERSATIONS_SPEC)
    view = JoinMaterializedView(v_dir, fact, dim)
    fact.ingest(paths["ev"], paths["base"], end_lsn=hi // 2)
    dim.ingest(paths["d_ev"], paths["d_base"], end_lsn=d_hi // 2)
    view.refresh()

    # grow both lakes 8 -> 16 mid-stream, resume ingest at the new width
    fact.split_partitions(factor=2)
    dim.split_partitions(factor=2)
    fact16 = CheckpointedIngest(f_dir, num_partitions=16)
    dim16 = CheckpointedIngest(d_dir, num_partitions=16, spec=CONVERSATIONS_SPEC)
    # the split stamps EVERY child with a fresh lineage epoch, so the view
    # sees all populated partitions stale even before any further ingest —
    # a pre-split view file can never survive at the new width
    probe = JoinMaterializedView(v_dir, fact16, dim16)
    stale = set(probe._stale_pids(fact16.manifest, dim16.manifest))
    populated = {
        pid for ing in (fact16, dim16)
        for pid, st in ing.manifest.partitions.items() if st.files
    }
    assert populated <= stale
    fact16.ingest(paths["ev"], None)
    dim16.ingest(paths["d_ev"], None)
    view16 = JoinMaterializedView(v_dir, fact16, dim16)
    view16.refresh()

    batch = CheckpointedIngest(tempfile.mkdtemp(prefix="jmv_pb_", dir="/tmp"), num_partitions=16)
    batch_d = CheckpointedIngest(
        tempfile.mkdtemp(prefix="jmv_pc_", dir="/tmp"), num_partitions=16,
        spec=CONVERSATIONS_SPEC,
    )
    vb = JoinMaterializedView(tempfile.mkdtemp(prefix="jmv_pw_", dir="/tmp"), batch, batch_d)
    batch.ingest(paths["ev"], paths["base"])
    batch_d.ingest(paths["d_ev"], paths["d_base"])
    vb.refresh()

    pd.testing.assert_frame_equal(_view_df(view16), _view_df(vb))
    pd.testing.assert_frame_equal(view16.rollup(), vb.rollup())


def test_refresh_crash_before_state_write_is_idempotent(paths):
    """A crash AFTER view files land but BEFORE the state file commits must
    leave the view re-refreshable: the reopened view sees the same stale
    set, rewrites the same files, and converges to the batch answer."""
    fact = CheckpointedIngest(tempfile.mkdtemp(prefix="jmv_cf_", dir="/tmp"), num_partitions=16)
    dim = CheckpointedIngest(
        tempfile.mkdtemp(prefix="jmv_cd_", dir="/tmp"), num_partitions=16,
        spec=CONVERSATIONS_SPEC,
    )
    v_dir = tempfile.mkdtemp(prefix="jmv_cv_", dir="/tmp")
    view = JoinMaterializedView(v_dir, fact, dim)
    fact.ingest(paths["ev"], paths["base"])
    dim.ingest(paths["d_ev"], paths["d_base"])
    first = view.refresh()
    want = _view_df(view)

    # simulate the crash: data files persisted, state write lost
    os.remove(os.path.join(v_dir, JoinMaterializedView.STATE_FILE))
    recovered = JoinMaterializedView(v_dir, fact, dim)
    second = recovered.refresh()
    assert second == first            # the SAME stale set re-runs
    assert recovered.refresh() == []  # and then the view is fresh
    pd.testing.assert_frame_equal(_view_df(recovered), want)
    pd.testing.assert_frame_equal(recovered.rollup(), view.rollup())


def test_view_freshness_metrics(paths):
    """metrics(): zero lag right after a refresh; a dim-only epoch shows up
    as dim-side staleness with epoch lag 1 and clears on the next refresh."""
    fact = CheckpointedIngest(tempfile.mkdtemp(prefix="jmv_mf_", dir="/tmp"), num_partitions=16)
    dim = CheckpointedIngest(
        tempfile.mkdtemp(prefix="jmv_md_", dir="/tmp"), num_partitions=16,
        spec=CONVERSATIONS_SPEC,
    )
    view = JoinMaterializedView(tempfile.mkdtemp(prefix="jmv_mv_", dir="/tmp"), fact, dim)
    fact.ingest(paths["ev"], paths["base"])
    dim.ingest(paths["d_ev"], paths["d_base"], end_lsn=1)
    view.refresh()
    m0 = view.metrics()
    assert m0["stale_partitions"] == 0
    assert m0["fact_epoch_lag_max"] == 0 and m0["dim_epoch_lag_max"] == 0

    dim.ingest(paths["d_ev"], None)  # dim-only epoch
    m1 = view.metrics()
    assert m1["fact_stale_partitions"] == 0
    assert m1["dim_stale_partitions"] > 0
    assert m1["dim_epoch_lag_max"] == 1

    view.refresh()
    assert view.metrics()["stale_partitions"] == 0
