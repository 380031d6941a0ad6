"""Fixture generator properties (FIXTURES.md §2): determinism, duplicate-LSN
replays, bounded disorder, Zipfian skew, DDL interleave."""

import numpy as np
import pyarrow.parquet as pq

from tapdata_connectors_ray.fixtures import (
    FixtureSpec,
    generate_fixture_tables,
)
from tapdata_connectors_ray.schema import EVENT_LOG_SCHEMA, TRANSCRIPTS_SCHEMA

SPEC = FixtureSpec(n_convs=50, mean_turns=5, n_events=2000)


def test_deterministic():
    b1, e1 = generate_fixture_tables(SPEC)
    b2, e2 = generate_fixture_tables(SPEC)
    assert b1.equals(b2)
    assert e1.equals(e2)


def test_schemas():
    base, events = generate_fixture_tables(SPEC)
    assert base.schema.equals(TRANSCRIPTS_SCHEMA)
    assert events.schema.equals(EVENT_LOG_SCHEMA)


def test_duplicate_lsn_replays_present():
    _, events = generate_fixture_tables(SPEC)
    lsn = events["lsn"].to_numpy()
    n_dupes = len(lsn) - len(np.unique(lsn))
    assert n_dupes > 0.8 * SPEC.dup_frac * SPEC.n_events


def test_bounded_disorder():
    _, events = generate_fixture_tables(SPEC)
    lsn = events["lsn"].to_numpy()
    # not already sorted (disorder exists) ...
    assert not np.all(np.diff(lsn) >= 0)
    # ... but bounded: each row within window of its LSN-order position
    rank = np.argsort(np.argsort(lsn, kind="stable"), kind="stable")
    assert np.abs(rank - np.arange(len(lsn))).max() <= 2 * SPEC.disorder_window


def test_zipf_skew():
    _, events = generate_fixture_tables(SPEC)
    import pandas as pd

    counts = pd.Series(events["conv_id"].to_numpy(zero_copy_only=False)).value_counts()
    # hottest conversation carries far more than the uniform share
    assert counts.iloc[0] > 5 * counts.mean()


def test_ddl_rows():
    _, events = generate_fixture_tables(SPEC)
    import pyarrow.compute as pc

    ddl = events.filter(pc.equal(events["op"], "DDL"))
    assert ddl.num_rows >= 4  # may include duplicate replays
    vers = sorted(set(ddl["schema_ver"].to_pylist()))
    assert vers == [2, 3, 4, 5]


def test_cached_fixture_roundtrip(smoke_fixture_dir):
    base = pq.read_table(smoke_fixture_dir + "/transcripts.parquet")
    events = pq.read_table(smoke_fixture_dir + "/events.parquet")
    assert base.schema.equals(TRANSCRIPTS_SCHEMA)
    assert events.schema.equals(EVENT_LOG_SCHEMA)
    assert events.num_rows > 10_000


def test_dim_fixture_deterministic_and_composed():
    """generate_conversation_dim_tables is byte-deterministic for a given
    conv-id universe, and its composition matches the documented mix:
    ~80% of convs in the base, inserts cover half the remainder, ~6% of
    base convs deleted, priority NULL exactly on deletes."""
    import numpy as np
    import pyarrow.compute as pc

    from tapdata_connectors_ray.fixtures import generate_conversation_dim_tables

    ids = np.array([f"conv-{i:08d}" for i in range(200)], dtype=object)
    b1, e1 = generate_conversation_dim_tables(ids)
    b2, e2 = generate_conversation_dim_tables(ids)
    assert b1.equals(b2) and e1.equals(e2)

    assert b1.num_rows == 160  # 80% of 200
    ops = e1["op"].to_numpy(zero_copy_only=False)
    ins_ids = set(e1.filter(pc.equal(e1["op"], "I"))["conv_id"].to_pylist())
    base_ids = set(b1["conv_id"].to_pylist())
    assert ins_ids.isdisjoint(base_ids)          # inserts are NEW convs
    assert (ops == "D").sum() >= b1.num_rows * 0.06 * 0.9
    d_mask = pc.equal(e1["op"], "D")
    assert pc.all(pc.is_null(e1.filter(d_mask)["priority"])).as_py()
    # non-delete rows always carry a priority
    nd = e1.filter(pc.invert(d_mask))
    assert pc.all(pc.is_valid(nd["priority"])).as_py()
