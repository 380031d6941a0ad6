"""Cross-table atomic commit (state/taskcommit.py): a multi-table epoch is
all-or-nothing — torn prepares are invisible, a committed-but-unfinalized
epoch rolls forward, retries converge.  Models the reference's transaction
around a multi-table write batch (``CommonDbConnector.java:737-757``,
``HuDiWriteBySparkClient.java:210-268``)."""

import shutil
import tempfile

import pandas as pd
import pytest
import pyarrow.dataset as pads

from tapdata_connectors_ray.pipelines.incremental import CheckpointedIngest
from tapdata_connectors_ray.state.checkpoint import load_manifest
from tapdata_connectors_ray.state.taskcommit import (
    InjectedTaskCrash,
    MultiTableTask,
    TaskCommitConflict,
    TaskManifest,
    commit_task_manifest,
    load_task_manifest,
)


@pytest.fixture(scope="module")
def second_paths():
    import os

    from tapdata_connectors_ray.fixtures import ensure_second_fixtures

    d = ensure_second_fixtures()
    return {
        "multilog": os.path.join(d, "multilog.parquet"),
        "t_base": os.path.join(d, "mt_transcripts_base.parquet"),
        "o_base": os.path.join(d, "orders_base.parquet"),
    }


@pytest.fixture(scope="module")
def cuts(second_paths):
    from tapdata_connectors_ray.pipelines.replay import lsn_bounds

    _, hi = lsn_bounds(second_paths["multilog"])
    return hi // 2, hi


def _mk_task(second_paths):
    """Fresh (task_dir, MultiTableTask) over two empty lakes."""
    import os

    from tapdata_connectors_ray.fixtures import ORDERS_SPEC
    from tapdata_connectors_ray.schema import TRANSCRIPTS_SPEC

    root = tempfile.mkdtemp(prefix="task_", dir="/tmp")
    ings = {
        "transcripts": CheckpointedIngest(
            os.path.join(root, "transcripts"), num_partitions=8,
            spec=TRANSCRIPTS_SPEC,
        ),
        "orders": CheckpointedIngest(
            os.path.join(root, "orders"), num_partitions=8, spec=ORDERS_SPEC
        ),
    }
    return root, MultiTableTask(os.path.join(root, "task"), ings)


def _epoch_kwargs(second_paths, cut, first_epoch):
    from tapdata_connectors_ray.fixtures import ORDERS_SPEC
    from tapdata_connectors_ray.pipelines.replay import (
        scan_evolution_plan_distributed,
    )
    from tapdata_connectors_ray.schema import TRANSCRIPTS_SPEC
    from tapdata_connectors_ray.state.registry import EvolutionPlan

    ml = second_paths["multilog"]
    tplan = scan_evolution_plan_distributed(ml, TRANSCRIPTS_SPEC)
    return {
        "transcripts": {
            "events_path": ml,
            "base_path": second_paths["t_base"] if first_epoch else None,
            "end_lsn": cut,
            "plan": tplan,
            "read_filter": pads.field("table_name") == "transcripts",
        },
        "orders": {
            "events_path": ml,
            "base_path": second_paths["o_base"] if first_epoch else None,
            "end_lsn": cut,
            "plan": EvolutionPlan(spec=ORDERS_SPEC),
            "read_filter": pads.field("table_name") == "orders",
        },
    }


def _snapshot(task):
    out = {}
    for name in ("orders", "transcripts"):
        df = task.dataset(name).to_pandas()
        keys = ["order_id"] if name == "orders" else ["conv_id", "turn_idx"]
        out[name] = df.sort_values(keys).reset_index(drop=True)
    return out


def _assert_same(a, b):
    for name in ("orders", "transcripts"):
        pd.testing.assert_frame_equal(a[name], b[name])


def test_torn_prepare_invisible_and_retry_converges(second_paths, cuts):
    cut1, cut2 = cuts

    # golden: clean two-epoch run
    groot, gtask = _mk_task(second_paths)
    gtask.commit_epoch(_epoch_kwargs(second_paths, cut1, True))
    golden_e1 = _snapshot(gtask)
    gtask.commit_epoch(_epoch_kwargs(second_paths, cut2, False))
    golden_e2 = _snapshot(gtask)

    # crash path: epoch 2 dies after the FIRST table's prepare ('orders'
    # sorts first) — before 'transcripts' even runs
    croot, ctask = _mk_task(second_paths)
    ctask.commit_epoch(_epoch_kwargs(second_paths, cut1, True))
    _assert_same(_snapshot(ctask), golden_e1)
    with pytest.raises(InjectedTaskCrash):
        ctask.commit_epoch(
            _epoch_kwargs(second_paths, cut2, False), crash_after_prepare="orders"
        )

    # recovery open: the torn epoch must be invisible — BOTH tables read at
    # the epoch-1 cut, not orders@2/transcripts@1
    import os

    ings2 = {
        "transcripts": CheckpointedIngest(
            os.path.join(croot, "transcripts"), num_partitions=8
        ),
        "orders": CheckpointedIngest(os.path.join(croot, "orders"), num_partitions=8),
    }
    task2 = MultiTableTask(os.path.join(croot, "task"), ings2)
    assert task2.manifest.task_epoch == 1
    _assert_same(_snapshot(task2), golden_e1)

    # retry converges on the golden epoch-2 state
    task2.commit_epoch(_epoch_kwargs(second_paths, cut2, False))
    assert task2.manifest.task_epoch == 2
    _assert_same(_snapshot(task2), golden_e2)

    shutil.rmtree(groot, ignore_errors=True)
    shutil.rmtree(croot, ignore_errors=True)


def test_crash_before_finalize_rolls_forward(second_paths, cuts):
    cut1, _ = cuts
    import os

    root, task = _mk_task(second_paths)
    with pytest.raises(InjectedTaskCrash):
        task.commit_epoch(
            _epoch_kwargs(second_paths, cut1, True), crash_before_finalize=True
        )
    # the parent committed: the epoch is durable even though no lake's own
    # manifest.json was finalized
    tm = load_task_manifest(os.path.join(root, "task"))
    assert tm is not None and tm.task_epoch == 1
    lake_t = os.path.join(root, "transcripts")
    m_before = load_manifest(lake_t)
    assert m_before is None or m_before.epoch == 0

    # recovery promotes the staged manifests into the lakes (roll-forward)
    ings2 = {
        "transcripts": CheckpointedIngest(lake_t, num_partitions=8),
        "orders": CheckpointedIngest(os.path.join(root, "orders"), num_partitions=8),
    }
    task2 = MultiTableTask(os.path.join(root, "task"), ings2)
    for name in ("transcripts", "orders"):
        m = load_manifest(os.path.join(root, name))
        assert m is not None and m.epoch == 1
        assert task2.dataset(name).count() > 0
    shutil.rmtree(root, ignore_errors=True)


def test_task_commit_cas_fences_concurrent_writers(tmp_path):
    d = str(tmp_path / "task")
    commit_task_manifest(d, TaskManifest(task_epoch=1), expected_epoch=0)
    # a second writer that loaded epoch 0 must lose
    with pytest.raises(TaskCommitConflict):
        commit_task_manifest(d, TaskManifest(task_epoch=1), expected_epoch=0)
    # the winner's successor commit proceeds
    commit_task_manifest(d, TaskManifest(task_epoch=2), expected_epoch=1)
    assert load_task_manifest(d).task_epoch == 2
