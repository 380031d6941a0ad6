"""End-to-end replay pipeline vs the oracle reducer (the FIXTURES.md §4
correctness cases: read-back equality, write counters, exactly-once replay,
salted-shuffle equivalence)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tapdata_connectors_ray.oracle import expected_counters, expected_final_state
from tapdata_connectors_ray.pipelines.replay import (
    replay_final_state,
    replay_write_counters,
)


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


def _as_sorted_df(ds_or_table) -> pd.DataFrame:
    df = ds_or_table.to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df["turn_score"] = df["turn_score"].astype("Int64")
    df["turn_idx"] = df["turn_idx"].astype("Int32")
    return df


def assert_matches(ds, expected):
    got = _as_sorted_df(ds)
    exp = _as_sorted_df(expected)
    pd.testing.assert_frame_equal(got, exp)


def test_replay_matches_oracle(paths, expected):
    ev, base = paths
    assert_matches(replay_final_state(ev, base, num_partitions=16), expected)


def test_replay_without_prereduce(paths, expected):
    ev, base = paths
    assert_matches(replay_final_state(ev, base, num_partitions=16, prereduce=False), expected)


def test_replay_salted(paths, expected):
    ev, base = paths
    assert_matches(
        replay_final_state(ev, base, num_partitions=8, salt_buckets=4), expected
    )


def test_replay_events_only(paths):
    ev, base = paths
    expected = expected_final_state(
        pq.read_table(base).slice(0, 0), pq.read_table(ev)
    )
    assert_matches(replay_final_state(ev, None, num_partitions=16), expected)


def test_exactly_once_double_replay(paths, expected):
    """Replaying the log twice (union with itself) must be a no-op — the
    idempotent dedup / LWW contract (FIXTURES.md §4.5)."""
    ev, base = paths
    assert_matches(replay_final_state([ev, ev], base, num_partitions=16), expected)


def test_write_counters_match_oracle(paths):
    ev, base = paths
    got = replay_write_counters(ev, base, num_partitions=16).to_pandas()
    totals = got.drop(columns=["partition_id"]).sum()
    exp = expected_counters(pq.read_table(base), pq.read_table(ev))
    assert totals["inserted"] == exp["inserted"]
    assert totals["modified"] == exp["modified"]
    assert totals["removed"] == exp["removed"]
    assert totals["skipped_duplicates"] == exp["skipped_duplicates"]


def test_semijoin_strategy_matches(paths, expected):
    """Two-pass winner-shuffle replay (stages/winners.py) must equal the
    one-pass keyed shuffle bit-for-bit."""
    ev, base = paths
    ds = replay_final_state(ev, base, num_partitions=16, strategy="semijoin")
    assert_matches(ds, expected)


def test_exactly_once_under_task_retry(paths, expected):
    """A flaky stage that fails once per block (then succeeds on Ray's task
    retry) must not change the replayed table — retried tasks re-emit their
    block and the LWW/dedup semantics absorb it (survey §7.4)."""
    import pyarrow as pa
    import ray

    @ray.remote
    class FailController:
        def __init__(self):
            self.seen = set()

        def should_fail(self, key):
            if key in self.seen:
                return False
            self.seen.add(key)
            return True

    ctrl = FailController.remote()
    ev, base = paths
    ds = replay_final_state(ev, base, num_partitions=16)

    def flaky(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        key = (batch["conv_id"][0].as_py(), batch["turn_idx"][0].as_py(), len(batch))
        if ray.get(ctrl.should_fail.remote(key)):
            raise RuntimeError("injected failure (should be retried)")
        return batch

    out = ds.map_batches(
        flaky, batch_format="pyarrow", retry_exceptions=True, max_retries=4
    )
    assert_matches(out, expected)


@pytest.mark.parametrize(
    "snapshot_frac,overlap_frac",
    [
        (0.6, 0.1),   # mid-version snapshot (v3), overlap spans the rename DDL
        (0.6, 0.0),   # resume exactly at the snapshot LSN (no overlap)
        (0.1, 0.05),  # snapshot before any DDL (v1 path)
        (0.95, 0.9),  # snapshot after all DDLs; near-total re-delivery
    ],
)
def test_snapshot_switchover_equals_full_replay(
    paths, expected, tmp_path, snapshot_frac, overlap_frac
):
    """Full-sync -> incremental handoff with overlap re-delivery converges to
    the one-pass replay (the reference records the stream offset BEFORE the
    snapshot and relies on idempotent writes to absorb the overlap)."""
    from tapdata_connectors_ray.pipelines.replay import replay_switchover

    ev, base = paths
    ds = replay_switchover(
        ev,
        base,
        num_partitions=8,
        snapshot_frac=snapshot_frac,
        overlap_frac=overlap_frac,
        snapshot_dir=str(tmp_path / f"snap_{snapshot_frac}_{overlap_frac}"),
    )
    assert_matches(ds, expected)


def test_dlq_tolerant_replay_equals_clean(paths, expected):
    """Malformed rows (unknown ops, NULL-key DML) are quarantined, not fatal;
    the tolerant replay over the dirty log equals the clean replay."""
    from tapdata_connectors_ray.fixtures import ensure_dirty_fixture

    _, base = paths
    dirty = ensure_dirty_fixture("sf0.001")
    assert_matches(
        replay_final_state(dirty, base, num_partitions=16, drop_malformed=True),
        expected,
    )


def test_malformed_reasons_classifier():
    import pyarrow as pa

    from tapdata_connectors_ray.schema import TRANSCRIPTS_SPEC
    from tapdata_connectors_ray.stages.normalize import malformed_reasons

    batch = pa.table(
        {
            "op": pa.array(["I", "X", "U", "D"], pa.string()),
            "conv_id": pa.array(["a", None, None, "d"], pa.string()),
            "turn_idx": pa.array([1, 2, 3, None], pa.int32()),
        }
    )
    r = malformed_reasons(batch, TRANSCRIPTS_SPEC)
    assert r.to_pylist() == [None, "bad_op", "null_key", "null_key"]


def test_render_transcripts_matches_oracle(paths, expected):
    """Per-conversation render == pandas assembly of the oracle final state
    (north-rule acceptance: per-turn text equality under turn_idx order)."""
    from tapdata_connectors_ray.pipelines.replay import render_transcripts

    ev, base = paths
    exp_df = expected.to_pandas().sort_values(["conv_id", "turn_idx"])
    line = exp_df["role"].fillna("") + ": " + exp_df["text"].fillna("")
    g = line.groupby(exp_df["conv_id"].to_numpy(), sort=True)
    exp = pd.DataFrame(
        {"conv_id": g.agg("size").index, "n_turns": g.size().to_numpy(),
         "transcript": g.agg("\n".join).to_numpy()}
    ).reset_index(drop=True)

    got = (
        render_transcripts(ev, base, num_partitions=16)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_transcript_quality_gate_matches_bruteforce(paths, expected):
    """Fused-merge gate == pandas recomputation over the oracle final state:
    identical stats AND identical keep set under the three thresholds."""
    from tapdata_connectors_ray.pipelines.replay import (
        TRANSCRIPT_GATE_MAX_CHARS,
        TRANSCRIPT_GATE_MIN_ASSISTANT,
        TRANSCRIPT_GATE_MIN_CHARS,
        TRANSCRIPT_GATE_MIN_TURNS,
        transcript_quality_gate,
    )

    exp_df = expected.to_pandas()
    tool_col = "tool_name" if "tool_name" in exp_df.columns else "tool"
    g = exp_df.groupby("conv_id", sort=True)
    stats = pd.DataFrame(
        {
            "n_turns": g.size(),
            "n_assistant": g["role"].agg(lambda s: int((s == "assistant").sum())),
            "n_tool": g[tool_col].agg(lambda s: int(s.notna().sum())),
            "total_chars": g["text"].agg(lambda s: int(s.fillna("").str.len().sum())),
        }
    )
    keep = stats[
        (stats["n_turns"] >= TRANSCRIPT_GATE_MIN_TURNS)
        & (stats["n_assistant"] >= TRANSCRIPT_GATE_MIN_ASSISTANT)
        & (stats["total_chars"] >= TRANSCRIPT_GATE_MIN_CHARS)
        & (stats["total_chars"] <= TRANSCRIPT_GATE_MAX_CHARS)
    ].reset_index()

    ev, base = paths
    got = (
        transcript_quality_gate(ev, base, num_partitions=16)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
        .astype({c: "int64" for c in ("n_turns", "n_assistant", "n_tool", "total_chars")})
    )
    assert len(got) < len(stats)  # the gate actually filters on this fixture
    pd.testing.assert_frame_equal(got, keep.astype(got.dtypes.to_dict()))


def test_transcript_tool_sequences_matches_bruteforce(paths, expected):
    """Fused-merge tool mining == pandas assembly over the oracle final
    state (ordered join of non-null tools per conversation)."""
    from tapdata_connectors_ray.pipelines.replay import transcript_tool_sequences

    exp_df = expected.to_pandas().sort_values(["conv_id", "turn_idx"])
    tool_col = "tool_name" if "tool_name" in exp_df.columns else "tool"
    g = exp_df.groupby("conv_id", sort=True)[tool_col]
    exp = pd.DataFrame(
        {
            "conv_id": g.size().index,
            "n_tool_calls": g.agg(lambda s: int(s.notna().sum())).to_numpy(),
            "tool_seq": g.agg(lambda s: ",".join(s.dropna())).to_numpy(),
        }
    ).reset_index(drop=True)

    ev, base = paths
    got = (
        transcript_tool_sequences(ev, base, num_partitions=16)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
        .astype({"n_tool_calls": "int64"})
    )
    assert (got["n_tool_calls"] > 0).any() and (got["n_tool_calls"] == 0).any()
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_transcript_piece_packing_matches_bruteforce(paths, expected):
    """Prefix-sum piece rule == per-conversation pandas recomputation, and
    the packing invariants hold: pieces partition each conversation's turns
    in order, char totals are preserved, and the fixture genuinely splits."""
    from tapdata_connectors_ray.pipelines.replay import (
        CONV_PACK_CHARS,
        transcript_piece_packing,
    )

    exp_df = expected.to_pandas().sort_values(["conv_id", "turn_idx"])
    ln = exp_df["text"].fillna("").str.len().astype("int64")
    before = ln.groupby(exp_df["conv_id"].to_numpy()).transform(
        lambda s: s.cumsum() - s
    )
    piece = (before // CONV_PACK_CHARS).astype("int64")
    exp = (
        pd.DataFrame(
            {"conv_id": exp_df["conv_id"].to_numpy(), "piece": piece.to_numpy(), "ln": ln.to_numpy()}
        )
        .groupby(["conv_id", "piece"], as_index=False)
        .agg(n_turns=("ln", "size"), n_chars=("ln", "sum"))
        .astype({"n_turns": "int64", "n_chars": "int64"})
    )

    ev, base = paths
    got = (
        transcript_piece_packing(ev, base, num_partitions=16)
        .to_pandas()
        .sort_values(["conv_id", "piece"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    # char totals preserved per conversation
    assert (
        got.groupby("conv_id")["n_chars"].sum().to_numpy()
        == ln.groupby(exp_df["conv_id"].to_numpy()).sum().to_numpy()
    ).all()
    assert (got["piece"] > 0).any()  # the fixture actually splits


def test_transcript_piece_render_matches_bruteforce(paths, expected):
    """Rendered piece text == pandas assembly under the same piece rule;
    re-joining a conversation's pieces reproduces the full transcript."""
    from tapdata_connectors_ray.pipelines.replay import (
        CONV_PACK_CHARS,
        transcript_piece_render,
    )

    exp_df = expected.to_pandas().sort_values(["conv_id", "turn_idx"])
    ln = exp_df["text"].fillna("").str.len().astype("int64")
    before = ln.groupby(exp_df["conv_id"].to_numpy()).transform(
        lambda s: s.cumsum() - s
    )
    line = exp_df["role"].fillna("") + ": " + exp_df["text"].fillna("")
    frame = pd.DataFrame(
        {
            "conv_id": exp_df["conv_id"].to_numpy(),
            "piece": (before // CONV_PACK_CHARS).to_numpy(),
            "line": line.to_numpy(),
        }
    )
    exp = (
        frame.groupby(["conv_id", "piece"], as_index=False)
        .agg(n_turns=("line", "size"), piece_text=("line", "\n".join))
        .astype({"n_turns": "int64", "piece": "int64"})
    )

    ev, base = paths
    got = (
        transcript_piece_render(ev, base, num_partitions=16)
        .to_pandas()
        .sort_values(["conv_id", "piece"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    # piece concatenation reproduces the whole conversation render
    whole = line.groupby(exp_df["conv_id"].to_numpy()).agg("\n".join)
    rejoined = got.groupby("conv_id")["piece_text"].agg("\n".join)
    assert (rejoined.to_numpy() == whole.to_numpy()).all()


def test_transcript_tool_transitions_matches_bruteforce(paths, expected):
    """Fused-merge transition partials == pandas shifted-pair recomputation
    over the oracle final state."""
    from tapdata_connectors_ray.pipelines.replay import (
        TOOL_TRANSITION_TOP,
        transcript_tool_transitions,
    )

    exp_df = expected.to_pandas().sort_values(["conv_id", "turn_idx"])
    tool_col = "tool_name" if "tool_name" in exp_df.columns else "tool"
    tl = exp_df[exp_df[tool_col].notna()]
    same = tl["conv_id"].to_numpy()[1:] == tl["conv_id"].to_numpy()[:-1]
    src = tl[tool_col].to_numpy()[:-1][same]
    dst = tl[tool_col].to_numpy()[1:][same]
    exp = (
        pd.DataFrame({"src": src, "dst": dst})
        .groupby(["src", "dst"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["n", "src", "dst"], ascending=[False, True, True])
        .head(TOOL_TRANSITION_TOP)
        .reset_index(drop=True)
        .astype({"n": "int64"})
    )

    ev, base = paths
    got = transcript_tool_transitions(ev, base, num_partitions=16).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    assert got["n"].sum() > 0


def test_footer_probe_distributed_past_threshold(ray_session, tmp_path):
    """At 5k segments the footer probe (row counts + LSN bounds) must fan
    out as Ray tasks, not a serial driver loop, and agree exactly with the
    driver-side probe on rows, bounds and the derived batch size."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines import replay

    d = tmp_path / "segs"
    d.mkdir()
    n_files = 5_000
    rng = np.random.default_rng(9)
    starts = rng.integers(1, 10_000_000, n_files)
    for i in range(n_files):
        pq.write_table(
            pa.table({"lsn": pa.array([int(starts[i]), int(starts[i]) + 3],
                                      pa.int64())}),
            str(d / f"seg-{i:05d}.parquet"),
        )
    paths = replay._expand_paths(str(d))
    assert len(paths) == n_files > replay.FOOTER_PROBE_DRIVER_MAX_FILES

    got = replay.footer_stats(paths)
    assert replay._LAST_FOOTER_PROBE_MODE == "distributed"
    want = replay._probe_footers(paths)  # serial driver probe, same fold
    assert got == want
    assert got[0] == 2 * n_files
    assert (got[1], got[2]) == (int(starts.min()), int(starts.max()) + 3)

    lo, hi = replay.lsn_bounds(str(d))
    assert (lo, hi) == (got[1], got[2])
    assert replay._LAST_FOOTER_PROBE_MODE == "distributed"

    # below the threshold the driver loop is used (no Ray-job fixed cost)
    small = paths[: replay.FOOTER_PROBE_DRIVER_MAX_FILES]
    assert replay.footer_stats(small) == replay._probe_footers(small)
    assert replay._LAST_FOOTER_PROBE_MODE == "driver"


def test_scd2_history_versions(paths, expected):
    """SCD Type 2 invariants on the smoke fixture: (a) the is_current=1
    slice equals the LWW final state; (b) per key, versions chain —
    valid_from strictly increasing and each valid_to equals the next
    version's valid_from when the next version exists at the same key."""
    from tapdata_connectors_ray.pipelines.replay import scd2_history

    ev, base = paths
    hist = scd2_history(ev, base, num_partitions=16).to_pandas()
    assert (hist["is_current"] == (hist["valid_to"].isna()).astype("int64")).all()

    import ray

    cur = hist[hist["is_current"] == 1][
        ["conv_id", "turn_idx", "role", "text", "tool_name", "turn_score", "ts"]
    ]
    # current slice == final state (keys whose last event is a delete have
    # no current version at all, matching the final state's absence)
    assert_matches(ray.data.from_pandas(cur.reset_index(drop=True)), expected)

    hist = hist.sort_values(["conv_id", "turn_idx", "valid_from"])
    g = hist.groupby(["conv_id", "turn_idx"], sort=False)
    assert (g["valid_from"].diff().dropna() > 0).all()
    # chain: within a key, a non-null valid_to is ≥ its own valid_from and
    # ≤ the next version's valid_from (a D event in between may end the
    # version strictly before the next one opens)
    nxt = g["valid_from"].shift(-1)
    closed = hist["valid_to"].notna()
    assert (hist.loc[closed, "valid_to"] > hist.loc[closed, "valid_from"]).all()
    has_next = nxt.notna()
    both = closed & has_next
    assert (hist.loc[both, "valid_to"] <= nxt[both]).all()


def test_change_data_feed_applies_to_snapshot(paths):
    """Applying the CDF delta (I=insert, U=replace, D=remove) to the state
    AS OF the cut LSN must reproduce the final state exactly."""
    import pyarrow.compute as pc

    from tapdata_connectors_ray.pipelines.replay import change_data_feed, lsn_bounds

    ev, base = paths
    _, hi = lsn_bounds(ev)
    cut = hi * 23 // 25
    ev_t = pq.read_table(ev)
    s1 = expected_final_state(
        pq.read_table(base), ev_t.filter(pc.less_equal(ev_t["lsn"], cut))
    ).to_pandas()
    s2 = expected_final_state(pq.read_table(base), ev_t).to_pandas()

    cdf = change_data_feed(ev, base, from_lsn=cut, num_partitions=16).to_pandas()
    assert set(cdf["op_cdf"]) <= {"I", "U", "D"}
    assert len(cdf) > 0  # the tail of the log genuinely changes state

    keyed = lambda df: df.set_index(["conv_id", "turn_idx"])
    state = keyed(s1)
    dele = cdf[cdf["op_cdf"] == "D"]
    state = state.drop(index=keyed(dele).index)
    up = keyed(cdf[cdf["op_cdf"].isin(["I", "U"])].drop(columns="op_cdf"))
    state = pd.concat([state.drop(index=up.index, errors="ignore"), up])
    got = state.reset_index().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = s2.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got = got[exp.columns]
    for c in ("turn_score",):
        got[c] = got[c].astype("Int64")
        exp[c] = exp[c].astype("Int64")
    got["turn_idx"] = got["turn_idx"].astype("Int32")
    exp["turn_idx"] = exp["turn_idx"].astype("Int32")
    pd.testing.assert_frame_equal(got, exp)


def test_loss_mask_kernel():
    """loss_mask_merged_table: whitespace-token convention (spaces+1, NULL
    text = 0), assistant-only masking, per-conversation segment sums over a
    key-sorted merged table."""
    import pyarrow as pa

    from tapdata_connectors_ray.pipelines.replay import loss_mask_merged_table

    merged = pa.table(
        {
            "conv_id": ["a", "a", "a", "b", "b"],
            "turn_idx": pa.array([0, 1, 2, 0, 1], pa.int32()),
            "role": ["user", "assistant", "tool", "assistant", "user"],
            "text": ["hi there", "one two three", None, "x", "y z"],
        }
    )
    out = loss_mask_merged_table(merged).to_pydict()
    assert out["conv_id"] == ["a", "b"]
    assert out["n_turns"] == [3, 2]
    assert out["n_tokens_total"] == [2 + 3 + 0, 1 + 2]
    assert out["n_tokens_masked"] == [3, 1]
    assert out["n_turns_masked"] == [1, 1]
