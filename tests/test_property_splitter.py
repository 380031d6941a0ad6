"""Property test: string-pk boundary planning equals exact order statistics
for arbitrary key sets — unicode, empty strings, long shared prefixes,
duplicate keys (the byte-level prefix-key code has sharp edges)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tapdata_connectors_ray.functions.partition_planner import (
    _str_prefix_key,
    pk_range_boundaries,
)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
            max_size=20,
        ),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from(["", "Customer#000", "abc"]),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_string_boundaries_match_order_statistics(ray_session, tmp_path_factory, keys, prefix):
    keys = [prefix + k for k in keys]
    d = tmp_path_factory.mktemp("split")
    path = str(d / "t.parquet")
    pq.write_table(pa.table({"k": pa.array(keys, pa.string())}), path)
    every = max(1, len(keys) // 3)
    got = pk_range_boundaries(path, "k", every=every, bins=16)["boundary"].tolist()
    # exact order statistics under BYTE order (= UTF-8 code-point order,
    # what both the splitter and DuckDB's binary collation use)
    exp_sorted = sorted(keys, key=lambda s: s.encode())
    exp = exp_sorted[::every]
    assert got == exp


def test_prefix_key_is_order_consistent():
    vals = ["", "\x00", "a", "ab", "abcdefgh", "abcdefghz", "abcdefgi",
            "é", "日本語テキスト", "z" * 30]
    k = _str_prefix_key(pa.array(vals), 0)
    enc = [v.encode() for v in vals]
    for i in range(len(vals)):
        for j in range(len(vals)):
            if k[i] < k[j]:
                assert enc[i] < enc[j], (vals[i], vals[j])


def test_temporal_and_binary_keys_split(ray_session, tmp_path):
    """Key-type dispatch: timestamp pk splits via the physical int64 path
    (boundaries restored to timestamps); binary pk via the byte-prefix
    path; an unsupported type raises."""
    import datetime

    import pandas as pd

    n = 101
    ts = [datetime.datetime(2026, 1, 1) + datetime.timedelta(minutes=7 * i) for i in range(n)]
    p1 = str(tmp_path / "ts.parquet")
    pq.write_table(pa.table({"k": pa.array(ts, pa.timestamp("us"))}), p1)
    got = pk_range_boundaries(p1, "k", every=25, bins=16)["boundary"]
    exp = sorted(ts)[::25]
    assert [pd.Timestamp(x) for x in got] == [pd.Timestamp(x) for x in exp]

    raw = [bytes([i % 7, 255 - i % 11, i % 256]) for i in range(n)]
    p2 = str(tmp_path / "bin.parquet")
    pq.write_table(pa.table({"k": pa.array(raw, pa.binary())}), p2)
    got2 = pk_range_boundaries(p2, "k", every=25, bins=16)["boundary"].tolist()
    assert got2 == sorted(raw)[::25]

    p3 = str(tmp_path / "bool.parquet")
    pq.write_table(pa.table({"k": pa.array([True, False] * 10)}), p3)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pk_range_boundaries(p3, "k", every=5)
