"""Property tests: the vectorized window folds in ``pipelines/relational.py``
(hopping expansion + per-bucket fold, gap-based sessionization) equal
brute-force O(n²) definitions on arbitrary little event sets — duplicate
timestamps, negative-window boundaries, single-event sessions, interleaved
users.  Fold-level (no Ray session): the Ray side of these queries is only a
coarse-bucket shuffle around the very folds exercised here."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tapdata_connectors_ray.pipelines.relational import (
    hopping_expand,
    hopping_fold,
    sessions_fold,
)

HOP = 100  # µs — tiny hop so many windows are exercised
GAP = 50  # µs inactivity gap


@st.composite
def event_sets(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    rows = []
    for i in range(n):
        rows.append(
            {
                "user_id": draw(st.integers(0, 3)),
                "ts": draw(st.integers(0, 600)),
                # integer-valued floats: sums are exact, no FP-order issues
                "value": float(draw(st.integers(0, 9))),
            }
        )
    return pd.DataFrame(rows)


@given(event_sets())
@settings(max_examples=80, deadline=None)
def test_hopping_matches_bruteforce(df):
    batch = pa.table(
        {
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts": pa.array(df["ts"].to_numpy(np.int64), pa.timestamp("us")),
            "value": df["value"].to_numpy(),
        }
    )
    got = hopping_fold(hopping_expand(batch, hop_us=HOP).to_pandas()).to_pandas()
    got = {
        (int(u), int(w)): (int(n), float(s))
        for u, w, n, s in zip(
            got["user_id"], got["win_start_us"], got["n_events"], got["sum_value"]
        )
    }

    # brute force: window [w0, w0 + 2*HOP) for every aligned start
    exp = {}
    for u in df["user_id"].unique():
        sub = df[df["user_id"] == u]
        starts = set()
        for t in sub["ts"]:
            w = (int(t) // HOP) * HOP
            starts.update((w, w - HOP))
        for w in starts:
            hit = sub[(sub["ts"] >= w) & (sub["ts"] < w + 2 * HOP)]
            if len(hit):
                exp[(int(u), int(w))] = (len(hit), float(hit["value"].sum()))
    assert got == exp


@given(event_sets())
@settings(max_examples=80, deadline=None)
def test_sessions_match_bruteforce(df):
    got = sessions_fold(df.copy(), GAP).to_pandas()
    got = {
        int(u): (int(n), int(m))
        for u, n, m in zip(
            got["user_id"], got["n_sessions"], got["max_session_events"]
        )
    }

    exp = {}
    for u in df["user_id"].unique():
        ts = sorted(int(t) for t in df.loc[df["user_id"] == u, "ts"])
        sessions = [[ts[0]]]
        for prev, cur in zip(ts, ts[1:]):
            if cur - prev > GAP:
                sessions.append([])
            sessions[-1].append(cur)
        exp[int(u)] = (len(sessions), max(len(s) for s in sessions))
    assert got == exp


# -- watermark / allowed-lateness flagging (events_window_late_data) --------


def _brute_late(ts_us: np.ndarray, lateness: int) -> np.ndarray:
    """O(n) single-process reference: watermark = strict-prefix max event
    time; late = ts < watermark - lateness; the first event is never late."""
    out = np.zeros(len(ts_us), dtype=bool)
    wm = None
    for i, t in enumerate(ts_us):
        if wm is not None and t < wm - lateness:
            out[i] = True
        wm = t if wm is None else max(wm, t)
    return out


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200),
    st.integers(min_value=0, max_value=2_000),
)
@settings(max_examples=200, deadline=None)
def test_late_flagging_matches_brute_force(ts_list, lateness):
    """The blockwise exclusive-cummax flagging (carried-in watermark +
    in-block prefix) equals the sequential definition for EVERY block split
    of the arrival sequence."""
    ts = np.asarray(ts_list, dtype=np.int64)
    expected = _brute_late(ts, lateness)

    # emulate the distributed two-pass over an arbitrary 2-block split
    for cut in (0, len(ts) // 2, len(ts)):
        got = np.zeros(len(ts), dtype=bool)
        carried = -(2**62)
        for lo, hi in ((0, cut), (cut, len(ts))):
            if lo == hi:
                continue
            blk = ts[lo:hi]
            inblock = np.empty_like(blk)
            inblock[0] = -(2**62)
            if len(blk) > 1:
                np.maximum.accumulate(blk[:-1], out=inblock[1:])
            wm = np.maximum(inblock, carried)
            got[lo:hi] = blk < wm - lateness
            carried = max(carried, int(blk.max()))
        assert (got == expected).all()


# -- per-window exact top-k (events_window_topk) ------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),      # window
            st.sampled_from(["a", "b", "c", "d"]),      # type
        ),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=100, deadline=None)
def test_window_topk_fold_matches_brute_force(rows):
    """The bucketed rank fold (partial counts summed, rank per window under
    (n DESC, type ASC)) equals the obvious per-window sort, for any block
    split of the input."""
    from tapdata_connectors_ray.pipelines.relational import WINDOW_TOPK

    df = pd.DataFrame(rows, columns=["win_hour", "event_type"])
    want = (
        df.groupby(["win_hour", "event_type"]).size().reset_index(name="n_events")
        .sort_values(["win_hour", "n_events", "event_type"], ascending=[True, False, True])
    )
    want["rank"] = want.groupby("win_hour").cumcount() + 1
    want = want[want["rank"] <= WINDOW_TOPK].reset_index(drop=True)

    # emulate two blocks of in-block partials + the bucket fold
    cut = len(df) // 2
    parts = []
    for blk in (df.iloc[:cut], df.iloc[cut:]):
        if len(blk):
            parts.append(
                blk.groupby(["win_hour", "event_type"]).size().reset_index(name="n_part")
            )
    partials = pd.concat(parts, ignore_index=True)
    g = (
        partials.groupby(["win_hour", "event_type"], sort=False)["n_part"].sum()
        .reset_index(name="n_events")
        .sort_values(["win_hour", "n_events", "event_type"], ascending=[True, False, True],
                     kind="stable")
    )
    g["rank"] = g.groupby("win_hour", sort=False).cumcount() + 1
    got = g[g["rank"] <= WINDOW_TOPK].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values(["win_hour", "rank"]).reset_index(drop=True),
        want.sort_values(["win_hour", "rank"]).reset_index(drop=True),
        check_dtype=False,
    )
