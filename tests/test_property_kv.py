"""Property test: the vectorized KV sink projection (``stages/kv.py``)
equals a row-at-a-time rendering of the reference's key/value build rules
(``AbstractRedisRecordWriter.java:94-146``): nulls render as ``"null"`` in
keys and text values, key = prefix + joined key fields + suffix."""

from __future__ import annotations

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tapdata_connectors_ray.stages.kv import make_kv_projection

VALS = st.one_of(st.none(), st.sampled_from(["a", "b|c", "", "x:y", '"q"']))


@st.composite
def tables(draw):
    n = draw(st.integers(1, 30))
    return {
        "k1": [draw(st.sampled_from(["p", "q", "r"])) for _ in range(n)],
        "k2": [draw(st.one_of(st.none(), st.integers(0, 5))) for _ in range(n)],
        "v1": [draw(VALS) for _ in range(n)],
        "v2": [draw(st.one_of(st.none(), st.integers(-3, 3))) for _ in range(n)],
    }


@given(tables())
@settings(max_examples=120, deadline=None)
def test_kv_projection_matches_row_rules(cols):
    batch = pa.table(
        {
            "k1": pa.array(cols["k1"], pa.string()),
            "k2": pa.array(cols["k2"], pa.int64()),
            "v1": pa.array(cols["v1"], pa.string()),
            "v2": pa.array(cols["v2"], pa.int64()),
        }
    )
    text = make_kv_projection(
        ["k1", "k2"], ["v1", "v2"], key_prefix="t:", key_suffix=":k"
    )(batch)
    js = make_kv_projection(
        ["k1", "k2"], ["v1", "v2"], value_mode="json"
    )(batch)

    n = len(cols["k1"])
    for i in range(n):
        k1, k2 = cols["k1"][i], cols["k2"][i]
        v1, v2 = cols["v1"][i], cols["v2"][i]
        key_core = f"{k1}:{'null' if k2 is None else k2}"
        assert text["kv_key"][i].as_py() == f"t:{key_core}:k"
        want_text = (
            ("null" if v1 is None else v1)
            + "|"
            + ("null" if v2 is None else str(v2))
        )
        assert text["kv_value"][i].as_py() == want_text
        assert js["kv_key"][i].as_py() == key_core
        assert json.loads(js["kv_value"][i].as_py()) == {"v1": v1, "v2": v2}
