"""Property tests: the inspect/diff family vs brute-force dictionaries on
arbitrary keyed tables (nulls, equal rows, disjoint keys, multi-field
divergence)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = [f"k{i}" for i in range(8)]
VALS = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
NUMS = st.one_of(st.none(), st.integers(min_value=0, max_value=3))


@st.composite
def keyed_table(draw):
    ks = draw(st.lists(st.sampled_from(KEYS), unique=True, max_size=8))
    return {k: (draw(VALS), draw(NUMS)) for k in ks}


def _to_ds(d: dict):
    rows = [{"k": k, "a": a, "b": b} for k, (a, b) in sorted(d.items())]
    schema = pa.schema(
        [pa.field("k", pa.string()), pa.field("a", pa.string()), pa.field("b", pa.int64())]
    )
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(left=keyed_table(), right=keyed_table())
def test_diff_and_roundtrip_vs_bruteforce(ray_session, left, right):
    from tapdata_connectors_ray.stages.inspector import (
        apply_change_events,
        dataset_diff,
        diff_to_events,
    )

    # brute-force classification
    exp = {}
    for k in set(left) | set(right):
        if k not in right:
            exp[k] = "peer_missing"
        elif k not in left:
            exp[k] = "peer_only"
        elif left[k] != right[k]:
            exp[k] = "field_mismatch"

    got = dataset_diff(_to_ds(left), _to_ds(right), ["k"], ["a", "b"], num_buckets=4)
    gd = got.to_pandas()
    if len(gd) == 0:  # Ray drops empty blocks (schema lost) — no diffs
        assert exp == {}
    else:
        assert dict(zip(gd["k"], gd["diff_kind"])) == exp

    # round trip: apply the captured events over right -> left, exactly
    events = diff_to_events(_to_ds(left), _to_ds(right), ["k"], ["a", "b"], num_buckets=4)
    ev_df = events.to_pandas()
    if len(ev_df) == 0:
        assert exp == {}  # equal tables -> no events; round trip is identity
        return
    schema = pa.schema(
        [pa.field("k", pa.string()), pa.field("a", pa.string()), pa.field("b", pa.int64())]
    )
    applied = apply_change_events(_to_ds(right), ray.data.from_pandas(ev_df), ["k"], schema, num_buckets=4)
    adf = applied.to_pandas()
    if len(adf) == 0:
        assert left == {}
        return
    back = {
        r["k"]: (r["a"] if pd.notna(r["a"]) else None,
                 int(r["b"]) if pd.notna(r["b"]) else None)
        for _, r in adf.iterrows()
    }
    assert back == left
