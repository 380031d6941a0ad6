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
