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


def test_hopping_window_covers_each_event_twice(ray_session):
    """size = 2×hop => every event lands in exactly 2 windows, and each
    window's count equals a brute-force interval count."""
    import duckdb

    from tapdata_connectors_ray.pipelines.relational import (
        _HOP_US,
        q_events_hopping_window,
    )

    got = q_events_hopping_window(SF).to_pandas()
    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert got["n_events"].sum() == 2 * n_events
    # brute-force check one user's windows
    ev = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) AS us FROM read_parquet('{SF}/events.parquet')"
    ).fetchdf()
    uid = ev["user_id"].iloc[0]
    sub = ev[ev["user_id"] == uid]["us"].to_numpy()
    for ws in got[got["user_id"] == uid]["win_start_us"].head(5):
        expect = ((sub >= ws) & (sub < ws + 2 * _HOP_US)).sum()
        row = got[(got["user_id"] == uid) & (got["win_start_us"] == ws)]
        assert int(row["n_events"].iloc[0]) == int(expect)


def test_broadcast_enrich_matches_pandas_join(ray_session):
    from tapdata_connectors_ray.pipelines.relational import q_lookup_enrich_customer

    got = q_lookup_enrich_customer(SF).to_pandas().sort_values("c_custkey")
    import pyarrow.parquet as pq

    c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    n = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    r = pq.read_table(f"{SF}/region.parquet").to_pandas()
    exp = (
        c.merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(r, left_on="n_regionkey", right_on="r_regionkey")
        .sort_values("c_custkey")
    )
    assert got["nation"].tolist() == exp["n_name"].tolist()
    assert got["region"].tolist() == exp["r_name"].tolist()


def test_quantiles_match_numpy_brute_force(ray_session):
    import duckdb

    from tapdata_connectors_ray.pipelines.relational import q_quantiles_lineitem

    got = q_quantiles_lineitem(SF)
    vals = duckdb.sql(
        f"SELECT l_quantity FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchnumpy()["l_quantity"]
    srt = np.sort(vals)
    for q, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")]:
        assert got[col].iloc[0] == srt[int(np.ceil(q * len(srt))) - 1]


def test_profile_counts(ray_session):
    import duckdb

    from tapdata_connectors_ray.pipelines.relational import q_profile_customer

    got = q_profile_customer(SF).set_index("column")
    exp = duckdb.sql(
        f"""SELECT count(DISTINCT c_mktsegment) AS a, count(DISTINCT c_nationkey) AS b,
            count(*) - count(c_acctbal) AS nulls
            FROM read_parquet('{SF}/customer.parquet')"""
    ).fetchone()
    assert got.loc["c_mktsegment", "n_distinct"] == exp[0]
    assert got.loc["c_nationkey", "n_distinct"] == exp[1]
    assert got.loc["c_acctbal", "null_count"] == exp[2]


def test_events_window_incremental_equals_batch():
    """The three-epoch window ledger union equals the one-shot tumbling
    aggregate (incremental == batch, the dedup-ledger invariant extended to
    windowed aggregates)."""
    from tapdata_connectors_ray.pipelines.relational import (
        q_events_tumbling_window,
        q_events_window_incremental,
    )

    keys = ["user_id", "win_hour"]
    batch = (
        q_events_tumbling_window(SF).to_pandas().sort_values(keys).reset_index(drop=True)
    )
    inc = (
        q_events_window_incremental(SF)
        .to_pandas()
        .sort_values(keys)
        .reset_index(drop=True)[batch.columns]
    )
    pd.testing.assert_frame_equal(inc, batch)


def test_json_props_agg_matches_duckdb(ray_session):
    """Vectorized NDJSON-buffer parse of the semi-structured ``props``
    column must agree with DuckDB's per-row ``->>`` extraction, including
    null/absent-key SQL semantics (count counts the row, SUM skips it)."""
    import duckdb

    from tapdata_connectors_ray.pipelines.relational import (
        RELATIONAL_SQL,
        q_json_props_agg,
    )

    got = q_json_props_agg(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(RELATIONAL_SQL["json_props_agg"]).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
