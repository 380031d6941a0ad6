"""Advance-filter algebra + consistency aggregates + partition planner
(survey §2.4/§2.5) — self-contained against small in-memory data and the
sf0.001 driver tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from tapdata_connectors_ray.functions.aggregates import (
    count_by_filter,
    min_max,
    table_hash,
    table_stats,
)
from tapdata_connectors_ray.functions.partition_planner import (
    minmax_split_partitions,
    pk_range_boundaries,
)
from tapdata_connectors_ray.functions.query import (
    AdvanceFilter,
    QueryOperator,
    SortOn,
    apply_advance_filter,
    query_by_filter,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def small_ds():
    df = pd.DataFrame(
        {
            "k": np.arange(100),
            "grp": ["a", "b"] * 50,
            "v": np.arange(100, dtype=float) * 1.5,
        }
    )
    return ray.data.from_pandas(df), df


def test_match_and_operators(small_ds):
    ds, df = small_ds
    flt = AdvanceFilter(
        match={"grp": "a"},
        operators=[QueryOperator("v", "gte", 30.0), QueryOperator("k", "lt", 80)],
    )
    got = apply_advance_filter(ds, flt).to_pandas()
    exp = df[(df.grp == "a") & (df.v >= 30.0) & (df.k < 80)]
    assert sorted(got["k"]) == sorted(exp["k"])


def test_projection_sort_limit_skip(small_ds):
    ds, df = small_ds
    flt = AdvanceFilter(
        projection=["k", "v"],
        sort_on=[SortOn("v", descending=True)],
        skip=5,
        limit=10,
    )
    got = apply_advance_filter(ds, flt).to_pandas()
    exp = df[["k", "v"]].sort_values("v", ascending=False).iloc[5:15]
    assert got["k"].tolist() == exp["k"].tolist()
    assert got.columns.tolist() == ["k", "v"]


def test_query_by_filter(small_ds):
    ds, _ = small_ds
    row = query_by_filter(ds, {"k": 42})
    assert row is not None and row["v"] == 63.0
    assert query_by_filter(ds, {"k": -1}) is None


def test_aggregates(small_ds):
    ds, df = small_ds
    assert count_by_filter(ds, AdvanceFilter(match={"grp": "b"})) == 50
    mn, mx = min_max(ds, "v")
    assert (mn, mx) == (0.0, 148.5)


def test_table_hash_order_insensitive(small_ds):
    ds, df = small_ds
    h1 = table_hash(ds, ["k", "grp", "v"])
    shuffled = ray.data.from_pandas(df.sample(frac=1.0, random_state=7))
    assert table_hash(shuffled, ["k", "grp", "v"]) == h1
    changed = df.copy()
    changed.loc[0, "v"] = -1.0
    assert table_hash(ray.data.from_pandas(changed), ["k", "grp", "v"]) != h1


def test_table_stats():
    st = table_stats(f"{SF}/orders.parquet")
    assert st["num_rows"] == pa.parquet.read_metadata(f"{SF}/orders.parquet").num_rows
    assert st["storage_bytes"] > 0


def test_pk_range_boundaries():
    b = pk_range_boundaries(f"{SF}/orders.parquet", "o_orderkey", every=1000)
    keys = np.sort(
        pa.parquet.read_table(f"{SF}/orders.parquet", columns=["o_orderkey"])[
            "o_orderkey"
        ].to_numpy()
    )
    assert b["boundary"].tolist() == keys[::1000].tolist()


def test_minmax_split_partitions():
    plan = minmax_split_partitions(
        f"{SF}/lineitem.parquet", "l_orderkey", target_rows=500, max_ratio=2
    )
    total = pa.parquet.read_metadata(f"{SF}/lineitem.parquet").num_rows
    assert plan["row_count"].sum() == total  # complete coverage, no overlap
    assert (plan["row_count"] <= 2 * 500 * 2).all()  # post-split bound (one bisect granularity)
