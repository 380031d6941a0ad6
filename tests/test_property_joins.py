"""Property tests: the vectorized per-bucket as-of / range-join folds in
``pipelines/relational.py`` equal brute-force O(n²) definitions on arbitrary
little event sets (duplicate timestamps, interleaved users, empty sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tapdata_connectors_ray.pipelines.relational import asof_fold, follow_count_fold

GAP = 100  # µs, small so intervals are exercised


@st.composite
def event_sets(draw, with_sides=False):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                "user_id": draw(st.integers(0, 3)),
                "ts": draw(st.integers(0, 500)),
                "value": float(draw(st.integers(0, 9))),
                "side": draw(st.integers(0, 1)) if with_sides else 0,
            }
        )
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    return df


@given(event_sets(with_sides=True))
@settings(max_examples=80, deadline=None)
def test_asof_fold_matches_bruteforce(df):
    got = asof_fold(df.copy()).set_index("event_id").sort_index()
    left = df[df["side"] == 1]
    right = df[df["side"] == 0]
    assert len(got) == len(left)
    for row in left.itertuples():
        cand = right[(right["user_id"] == row.user_id) & (right["ts"] <= row.ts)]
        g = got.loc[row.event_id]
        if cand.empty:
            assert np.isnan(g["view_event_id"])
        else:
            best_ts = cand["ts"].max()
            best = cand[cand["ts"] == best_ts]["event_id"].max()  # tie-break
            assert g["view_event_id"] == float(best)


@given(event_sets())
@settings(max_examples=80, deadline=None)
def test_follow_count_fold_matches_bruteforce(df):
    got = follow_count_fold(df.copy(), gap_us=GAP).set_index("event_id")["n_follow"]
    ts_us = df["ts"].astype("int64")
    for row in df.assign(ts_us=ts_us).itertuples():
        exp = int(
            (
                (df["user_id"] == row.user_id)
                & (ts_us > row.ts_us)
                & (ts_us <= row.ts_us + GAP)
            ).sum()
        )
        assert got.loc[row.event_id] == exp
