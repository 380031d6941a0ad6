"""Deterministic synthetic fixtures: transcripts base table + change-event log.

Models the reference's synthetic source connector (rate-controlled
insert/update/delete generator, reference: ``connectors/dummy-connector/.../
DummyConnector.java:146-234``) and the CDC fixture requirements of
FIXTURES.md §2:

- seeded RNG (seed=42 convention) -> byte-stable across runs;
- insert -> update -> delete lifecycles per key with a configurable op mix;
- **duplicate-LSN replays**: a fraction of events re-emitted verbatim
  (exercises idempotent dedup / exactly-once);
- **bounded disorder**: file row order is permuted within a window relative
  to LSN order (exercises order-insensitive LWW-by-LSN apply);
- **hot-key skew**: Zipfian conv_id popularity (exercises the salted-shuffle
  path demanded by the north rule);
- **schema evolution**: DDL rows interleaved at fixed LSN fractions
  (ADD tool_meta @ v2, RENAME tool->tool_name @ v3, WIDEN turn_score
  int32->int64 @ v4), mirroring the MySQL DDL wrapper cases (reference:
  ``connectors-common/mysql-core/.../ddl/ccj/*``, survey §2.3).

Everything is vectorized numpy/pandas; generation is cached on disk keyed by
a parameter fingerprint so repeated test/bench runs are free.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tapdata_connectors_ray.schema import EVENT_LOG_SCHEMA, TRANSCRIPTS_SCHEMA

FIXTURE_VERSION = 9  # bump to invalidate cached fixtures

_EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in microseconds


@dataclass(frozen=True)
class FixtureSpec:
    n_convs: int = 400
    mean_turns: int = 8
    n_events: int = 12_000
    seed: int = 42
    dup_frac: float = 0.05       # fraction of events re-emitted verbatim
    disorder_window: int = 512   # file-order permutation window vs LSN order
    zipf_s: float = 1.1          # conv popularity skew exponent
    with_ddl: bool = True
    op_mix: tuple[float, float, float] = (0.35, 0.5, 0.15)  # I / U / D

    def fingerprint(self) -> str:
        payload = json.dumps(
            {"v": FIXTURE_VERSION, **asdict(self)}, sort_keys=True, default=list
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


SCALE_PRESETS: dict[str, FixtureSpec] = {
    # t1 smoke — fast pytest path
    "sf0.001": FixtureSpec(n_convs=400, mean_turns=8, n_events=12_000),
    # t2 correctness — driver oracle comparison scale
    "sf0.01": FixtureSpec(n_convs=3_000, mean_turns=10, n_events=120_000),
    # bench
    "sf0.1": FixtureSpec(n_convs=20_000, mean_turns=12, n_events=1_200_000),
    "sf1": FixtureSpec(n_convs=120_000, mean_turns=12, n_events=12_000_000),
    # scaling-proof tier: enough work per core that fixed overheads (~6 s)
    # stop dominating the 4N run (see BASELINE.md scaling methodology)
    "sf3": FixtureSpec(n_convs=360_000, mean_turns=12, n_events=36_000_000),
}

DEFAULT_FIXTURE_ROOT = "/tmp/tcr_fixtures"

# DDL schedule: (lsn_fraction, new_version, payload) — FIXTURES.md §3, plus
# the drop case (MysqlDropColumnDDLWrapper analogue): the v2-added column is
# dropped again at v5, so the final schema carries no tool_meta
DDL_SCHEDULE = (
    (0.25, 2, {"kind": "add_field", "name": "tool_meta", "type": "string"}),
    # index lifecycle events are schema NO-OPS (same version as the change
    # before them) but must survive as typed history rows (kind="index")
    (0.30, 2, {"kind": "create_index", "name": "idx_conv_turn",
               "columns": ["conv_id", "turn_idx"], "unique": True}),
    (0.50, 3, {"kind": "rename_field", "from": "tool", "to": "tool_name"}),
    (0.75, 4, {"kind": "widen_field", "name": "turn_score",
               "from_type": "int32", "to_type": "int64"}),
    (0.85, 4, {"kind": "drop_index", "name": "idx_conv_turn"}),
    (0.90, 5, {"kind": "drop_field", "name": "tool_meta"}),
)

_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOL_POOL = np.array(["search", "python", "browser", "calculator", "retrieval"])


def _conv_ids(n: int) -> np.ndarray:
    return np.char.add("conv-", np.char.zfill(np.arange(n).astype(str), 8))


def _texts(conv_idx: np.ndarray, turn_idx: np.ndarray, version: np.ndarray) -> np.ndarray:
    """Deterministic per-(key, version) text; the per-row equality oracle column."""
    body = np.char.add(
        np.char.add(np.char.add("c", conv_idx.astype(str)), "-t"),
        turn_idx.astype(str),
    )
    tail = np.char.add("-v", version.astype(str))
    base = np.char.add(body, tail)
    # pad to a realistic turn length without per-row Python
    filler = np.char.add(" ", np.char.multiply("lorem ipsum dolor sit amet ", 3))
    return np.char.add(base, filler)


def generate_base(spec: FixtureSpec, rng: np.random.Generator) -> pa.Table:
    """The initial lake snapshot (schema v1) — the ``batchRead`` phase output
    (reference: ``CommonDbConnector.java:579-606``)."""
    n_turns = 1 + rng.poisson(spec.mean_turns - 1, size=spec.n_convs)
    conv_rep = np.repeat(np.arange(spec.n_convs), n_turns)
    turn = np.concatenate([np.arange(k) for k in n_turns]).astype(np.int32)
    n = len(conv_rep)
    conv_id = _conv_ids(spec.n_convs)[conv_rep]
    role = _ROLES[turn % 4]
    text = _texts(conv_rep, turn, np.zeros(n, dtype=np.int64))
    tool = np.where(
        rng.random(n) < 0.3, _TOOL_POOL[rng.integers(0, len(_TOOL_POOL), n)], None
    )
    score = rng.integers(0, 1000, n).astype(np.int64)
    ts = _EPOCH_US + conv_rep.astype(np.int64) * 3_600_000_000 + turn.astype(np.int64) * 60_000_000
    return pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": turn,
            "role": role,
            "text": text,
            "tool": tool,
            "turn_score": score.astype(np.int32),
            "ts": ts.view("datetime64[us]"),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def _zipf_conv_choice(spec: FixtureSpec, rng: np.random.Generator, size: int) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, spec.n_convs + 1, dtype=np.float64), spec.zipf_s)
    w /= w.sum()
    # permute so hot conversations aren't simply the lowest ids
    perm = rng.permutation(spec.n_convs)
    cdf = np.cumsum(w)
    ranks = np.searchsorted(cdf, rng.random(size), side="right")
    return perm[np.clip(ranks, 0, spec.n_convs - 1)]


def generate_events(
    spec: FixtureSpec, rng: np.random.Generator, base_turns: np.ndarray
) -> pa.Table:
    """The ordered change-event log (the ``streamRead`` phase, serialized).

    ``base_turns[c]`` = number of base-snapshot turns of conversation ``c``.
    LSNs start at 1 (the base snapshot is LSN 0).  Row order in the returned
    table is LSN order permuted within ``disorder_window``; duplicate events
    are appended near their originals.
    """
    n = spec.n_events
    p_i, p_u, p_d = spec.op_mix
    op_draw = rng.random(n)
    op = np.where(op_draw < p_i, "I", np.where(op_draw < p_i + p_u, "U", "D"))

    conv = _zipf_conv_choice(spec, rng, n)
    max_turn = base_turns[conv]
    # inserts append new turns: turn_idx >= base_turns (collisions across
    # inserts of the same conv are fine — LWW treats the later as an upsert)
    ins_extra = rng.integers(0, 6, n)
    upd_turn = (rng.random(n) * np.maximum(max_turn, 1)).astype(np.int64)
    turn0 = np.where(op == "I", max_turn + ins_extra, upd_turn).astype(np.int32)

    # key-changing updates (~2% of U): the row moves to a disjoint turn slot
    # (+5000 — inserts stay < ~5000); the event carries the before-image key
    # (MysqlReader.java:646-668 carries before+after)
    move = (op == "U") & (rng.random(n) < 0.02)
    turn = np.where(move, turn0 + 5000, turn0).astype(np.int32)

    lsn = np.arange(1, n + 1, dtype=np.int64)

    # schema version per LSN from the DDL schedule
    ver = np.full(n, 1, dtype=np.int32)
    ddl_rows = []
    if spec.with_ddl:
        for frac, new_ver, payload in DDL_SCHEDULE:
            at = int(n * frac)
            ver[lsn > at] = new_ver
            ddl_rows.append((at, new_ver, json.dumps(payload, sort_keys=True)))

    role = _ROLES[turn % 4]
    text = _texts(conv, turn.astype(np.int64), lsn)
    have_tool = rng.random(n) < 0.4
    tool_vals = _TOOL_POOL[rng.integers(0, len(_TOOL_POOL), n)]
    tool = np.where(have_tool & (ver < 3), tool_vals, None)
    tool_name = np.where(have_tool & (ver >= 3), tool_vals, None)
    tool_meta = np.where(
        (rng.random(n) < 0.5) & (ver >= 2) & (ver < 5),  # column lives v2..v4
        np.char.add("meta-", lsn.astype(str)),
        None,
    )
    # int32 range until the widen DDL, then values that overflow int32
    score = rng.integers(0, 1000, n).astype(np.int64)
    score = np.where(ver >= 4, score + 5_000_000_000, score)
    ts = _EPOCH_US + 10_000_000_000 + lsn * 1_000_000

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "conv_id": _conv_ids(spec.n_convs)[conv],
            "turn_idx": turn,
            "role": role,
            "text": text,
            "tool": tool,
            "tool_name": tool_name,
            "tool_meta": tool_meta,
            "turn_score": score,
            "ts": ts.view("datetime64[us]"),
            "schema_ver": ver,
            "ddl_payload": None,
            "before_conv_id": np.where(move, _conv_ids(spec.n_convs)[conv], None),
            "before_turn_idx": pd.Series(turn0.astype("float64")).where(move),
        }
    )
    # deletes / DDL carry no after-image payload
    is_d = df["op"].to_numpy() == "D"
    for col in ("role", "text", "tool", "tool_name", "tool_meta"):
        df.loc[is_d, col] = None
    df.loc[is_d, "turn_score"] = np.nan

    if ddl_rows:
        ddl_df = pd.DataFrame(
            {
                "lsn": [at for at, _, _ in ddl_rows],
                "op": "DDL",
                "conv_id": None,
                "turn_idx": np.nan,
                "role": None,
                "text": None,
                "tool": None,
                "tool_name": None,
                "tool_meta": None,
                "turn_score": np.nan,
                "ts": pd.Series([pd.NaT] * len(ddl_rows), dtype="datetime64[us]"),
                "schema_ver": [v for _, v, _ in ddl_rows],
                "ddl_payload": [p for _, _, p in ddl_rows],
                "before_conv_id": None,
                "before_turn_idx": np.nan,
            }
        )
        # DDL events take the LSN slot of the DML event at that position;
        # shift the colliding DML event by +0 is avoided by giving DDL the
        # half-step below: multiply all LSNs by 2, DDL gets odd slots.
        df["lsn"] = df["lsn"] * 2
        ddl_df["lsn"] = ddl_df["lsn"] * 2 + 1
        df = pd.concat([df, ddl_df], ignore_index=True)
        df = df.sort_values("lsn", kind="stable", ignore_index=True)

    m = len(df)
    # duplicate-LSN replays: re-emit a sample of rows verbatim
    n_dup = int(m * spec.dup_frac)
    if n_dup:
        dup_idx = rng.choice(m, size=n_dup, replace=False)
        dup = df.iloc[dup_idx]
        df = pd.concat([df, dup], ignore_index=True)

    # bounded disorder: sort by (lsn-order rank + jitter(window)) — each row
    # lands within disorder_window positions of its LSN-order slot
    jitter = rng.integers(0, max(spec.disorder_window, 1), len(df))
    rank = np.argsort(np.argsort(df["lsn"].to_numpy(), kind="stable"), kind="stable")
    order = np.argsort(rank + jitter, kind="stable")
    df = df.iloc[order].reset_index(drop=True)

    df["turn_idx"] = df["turn_idx"].astype("Int32")
    df["turn_score"] = df["turn_score"].astype("Int64")
    df["schema_ver"] = df["schema_ver"].astype("int32")
    df["before_turn_idx"] = df["before_turn_idx"].astype("Int32")
    return pa.Table.from_pandas(df, schema=EVENT_LOG_SCHEMA, preserve_index=False)


def generate_fixture_tables(spec: FixtureSpec) -> tuple[pa.Table, pa.Table]:
    rng = np.random.default_rng(spec.seed)
    base = generate_base(spec, rng)
    n_turns = np.zeros(spec.n_convs, dtype=np.int64)
    counts = (
        pd.Series(base["conv_id"].to_numpy(zero_copy_only=False)).value_counts()
    )
    idx = np.array([int(c.split("-")[1]) for c in counts.index])
    n_turns[idx] = counts.to_numpy()
    events = generate_events(spec, rng, n_turns)
    return base, events


METRICS_NUM_PARTITIONS = 64
METRICS_TWIN_VERSION = 2  # bump when the twin's semantics change (cache upgrade)


def expected_partition_metrics(
    base: pa.Table, events: pa.Table, num_partitions: int = METRICS_NUM_PARTITIONS
) -> pa.Table:
    """Expected per-partition (applied_lsn, rows) after a full single-epoch
    ingest — a pandas twin of the LWW semantics (NOT the engine's merge code)
    computed at fixture-generation time, so ``cdc_partition_metrics`` gets a
    value oracle.  Only the partition-hash function is shared with the
    engine: the partition layout is engine-defined by nature."""
    from tapdata_connectors_ray.functions.hashing import partition_ids

    ev = events.select(
        ["lsn", "op", "conv_id", "turn_idx", "before_conv_id", "before_turn_idx", "ts"]
    ).to_pandas()
    ev = ev[ev["op"] != "DDL"]
    moved = ev[
        (ev["op"] == "U")
        & ev["before_turn_idx"].notna()
        & (
            (ev["before_conv_id"] != ev["conv_id"])
            | (ev["before_turn_idx"] != ev["turn_idx"])
        )
    ]
    tomb = pd.DataFrame(
        {
            "lsn": moved["lsn"],
            "op": "D",
            "conv_id": moved["before_conv_id"],
            "turn_idx": moved["before_turn_idx"],
        }
    )
    base_df = pd.DataFrame(
        {
            "lsn": np.int64(0),
            "op": "I",
            "conv_id": base["conv_id"].to_numpy(zero_copy_only=False),
            "turn_idx": base["turn_idx"].to_numpy(zero_copy_only=False),
        }
    )
    allv = pd.concat(
        [base_df, ev[["lsn", "op", "conv_id", "turn_idx"]], tomb], ignore_index=True
    )
    allv = allv.drop_duplicates(["lsn", "conv_id", "turn_idx"], keep="first")
    lww = allv.sort_values("lsn", kind="stable").drop_duplicates(
        ["conv_id", "turn_idx"], keep="last"
    )
    pids_all = partition_ids(allv["conv_id"].to_numpy(), num_partitions)
    live = lww[lww["op"] != "D"].copy()
    live["pid"] = partition_ids(live["conv_id"].to_numpy(), num_partitions)
    g = live.groupby("pid")
    rows = g.size()
    # applied watermark = max lsn ROUTED to the partition (tombstones and
    # LWW losers included -- a dropped delete is still an applied event; the
    # engine records the same, incremental.py MergeApplyWriter max over the
    # epoch's input events)
    applied = pd.Series(allv["lsn"].to_numpy()).groupby(pids_all).max()
    # partitions that received events but hold no live rows still commit
    all_pids = np.unique(pids_all)
    out = pd.DataFrame(
        {
            "partition_id": all_pids.astype(np.int32),
            "applied_lsn": applied.reindex(all_pids, fill_value=-1).to_numpy(np.int64),
            "rows": rows.reindex(all_pids, fill_value=0).to_numpy(np.int64),
        }
    )
    max_ver = int(pd.Series(events["schema_ver"].to_numpy(zero_copy_only=False)).max())
    out["epoch"] = np.int64(1)
    out["schema_version"] = np.int64(max_ver)
    # source-clock watermark twin: max event ts (µs) per POST-image routed
    # partition (event ts is monotone in lsn, so prereduce/LWW drops on the
    # engine side can never lose a partition's max; synthetic key-move
    # tombstones carry null ts there and don't route ts to the old key's
    # partition here either)
    wm = (
        pd.Series(ev["ts"].astype("int64").to_numpy())
        .groupby(partition_ids(ev["conv_id"].to_numpy(), num_partitions))
        .max()
    )
    out["watermark_ts"] = wm.reindex(all_pids, fill_value=-1).to_numpy(np.int64)
    t = pa.Table.from_pandas(out, preserve_index=False)
    return t.replace_schema_metadata(
        {"metrics_twin_version": str(METRICS_TWIN_VERSION)}
    )


_SHARD_ROWS = 64 * 1024


def _write_sharded(table: pa.Table, out_dir: str) -> None:
    """Write a table as a directory of <=64k-row parquet segment files.
    Schema metadata (the pandas block dict) is stripped — Ray's executor
    can't hash dict-bearing schemas and logs a warning per read."""
    os.makedirs(out_dir, exist_ok=True)
    table = table.replace_schema_metadata(None)
    n = table.num_rows
    n_shards = max(1, (n + _SHARD_ROWS - 1) // _SHARD_ROWS)
    for i in range(n_shards):
        chunk = table.slice(i * _SHARD_ROWS, _SHARD_ROWS)
        pq.write_table(chunk, os.path.join(out_dir, f"part-{i:05d}.parquet"))


def parquet_num_rows(path: str) -> int:
    """Row count from parquet footer metadata only (file or segment dir)."""
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows


def _upgrade_expected_metrics(out: str) -> None:
    """Refresh a cached ``expected_partition_metrics.parquet`` whose schema
    predates a metrics-surface addition (e.g. ``watermark_ts``) WITHOUT
    regenerating the whole fixture — base/events parquet are untouched, only
    the pandas twin is recomputed from them."""
    expected = os.path.join(out, "expected_partition_metrics.parquet")
    try:
        schema = pq.read_schema(expected)
        meta = schema.metadata or {}
        ver = int(meta.get(b"metrics_twin_version", b"1"))
        if "watermark_ts" in schema.names and ver >= METRICS_TWIN_VERSION:
            return
    except (OSError, pa.ArrowInvalid):
        return  # no expected file in this layout — nothing to upgrade
    base = pq.read_table(os.path.join(out, "transcripts.parquet"))
    events = pq.read_table(os.path.join(out, "events.parquet"))
    tmp = expected + ".tmp"
    pq.write_table(expected_partition_metrics(base, events), tmp)
    os.replace(tmp, expected)


def ensure_fixtures(
    sf: str = "sf0.001",
    root: str = DEFAULT_FIXTURE_ROOT,
    spec: FixtureSpec | None = None,
) -> str:
    """Generate (or reuse cached) fixture parquet files; returns the directory.

    Layout: ``<root>/<sf>/{transcripts.parquet,events.parquet,meta.json}``.
    Cache key = parameter fingerprint, so spec changes regenerate.
    """
    spec = spec or SCALE_PRESETS[sf]
    out = os.path.join(root, sf)
    meta_path = os.path.join(out, "meta.json")
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                if json.load(f).get("fingerprint") == spec.fingerprint():
                    _upgrade_expected_metrics(out)
                    return out
        except (json.JSONDecodeError, OSError):
            pass
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    base, events = generate_fixture_tables(spec)
    # shard into many files (the log-segment layout a 100 TB lake uses):
    # Ray schedules one read task per file, so sharding parallelizes the read
    _write_sharded(base, os.path.join(tmp, "transcripts.parquet"))
    _write_sharded(events, os.path.join(tmp, "events.parquet"))
    pq.write_table(
        expected_partition_metrics(base, events),
        os.path.join(tmp, "expected_partition_metrics.parquet"),
    )
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(
            {"fingerprint": spec.fingerprint(), "spec": asdict(spec),
             "base_rows": base.num_rows, "event_rows": events.num_rows},
            f, indent=2, default=list,
        )
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


def sf_label_from_dir(sf_dir: str) -> str:
    """Map a driver sf dir like /root/testdata/sf0.01 to a fixture preset label."""
    label = os.path.basename(os.path.normpath(sf_dir))
    return label if label in SCALE_PRESETS else "sf0.01"


def oracle_sf_dir() -> str:
    """The testdata tier ``oracle_sql()`` strings are rendered for.

    The round driver runs correctness at sf0.01 (the default); local gates
    (scripts/mini_driver.py) export ``TCR_ORACLE_SF_DIR`` so the same oracle
    strings can be re-rendered for any tier — nothing else in the engine
    reads this (queries always take their ``sf_dir`` as an argument)."""
    return os.environ.get("TCR_ORACLE_SF_DIR", "/root/testdata/sf0.01")


# ---------------------------------------------------------------------------
# Second-table fixtures: the table-generic conformance surface.
#
# The engine is parameterized by TableSpec (the TapTable analogue); these
# fixtures prove a SECOND logical table with a different key/column set — and
# a no-PK table — replay through the SAME code path.
# ---------------------------------------------------------------------------

from tapdata_connectors_ray.schema import TableSpec  # noqa: E402

SECOND_FIXTURE_VERSION = 4

ORDERS_SCHEMA = pa.schema(
    [
        pa.field("order_id", pa.int64()),
        pa.field("status", pa.string()),
        pa.field("amount_cents", pa.int64()),
        pa.field("region", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# single-int-key CDC table (key shape the transcripts table does NOT cover)
ORDERS_SPEC = TableSpec(
    name="orders_cdc", base_schema=ORDERS_SCHEMA, key_columns=("order_id",)
)

CLICKS_SCHEMA = pa.schema(
    [
        pa.field("uid", pa.string()),  # nullable -> exercises null-safe keys
        pa.field("page", pa.string()),
        pa.field("n", pa.int64()),
    ]
)

# no-PK table: all columns form the key, null-safe (the reference's
# all-columns fallback, NormalWriteRecorder.java:64-79,365-376)
CLICKS_SPEC = TableSpec(name="clicks", base_schema=CLICKS_SCHEMA, key_columns=None)

_ORDER_STATUSES = np.array(["new", "paid", "shipped", "delivered", "returned"])
_REGIONS = np.array(["emea", "amer", "apac", "latam"])


def _dup_and_disorder(df: pd.DataFrame, rng: np.random.Generator,
                      dup_frac: float, window: int) -> pd.DataFrame:
    """Duplicate-LSN verbatim replays + bounded file-order disorder (same
    torture cases as the transcripts log)."""
    m = len(df)
    n_dup = int(m * dup_frac)
    if n_dup:
        dup = df.iloc[rng.choice(m, size=n_dup, replace=False)]
        df = pd.concat([df, dup], ignore_index=True)
    jitter = rng.integers(0, max(window, 1), len(df))
    rank = np.argsort(np.argsort(df["lsn"].to_numpy(), kind="stable"), kind="stable")
    return df.iloc[np.argsort(rank + jitter, kind="stable")].reset_index(drop=True)


def generate_orders_tables(
    n_base: int = 3_000, n_events: int = 15_000, seed: int = 7
) -> tuple[pa.Table, pa.Table]:
    """orders base snapshot + I/U/D change log (no DDL; schema_ver==1).
    Updates use a fresh after-image; deletes carry only the key."""
    rng = np.random.default_rng(seed)
    ids = np.arange(n_base, dtype=np.int64)
    base = pa.table(
        {
            "order_id": ids,
            "status": _ORDER_STATUSES[rng.integers(0, len(_ORDER_STATUSES), n_base)],
            "amount_cents": rng.integers(100, 1_000_000, n_base).astype(np.int64),
            "region": _REGIONS[ids % len(_REGIONS)],
            "ts": (_EPOCH_US + ids * 1_000_000).view("datetime64[us]"),
        },
        schema=ORDERS_SCHEMA,
    )

    draw = rng.random(n_events)
    op = np.where(draw < 0.3, "I", np.where(draw < 0.8, "U", "D"))
    lsn = np.arange(1, n_events + 1, dtype=np.int64)
    new_ids = n_base + rng.integers(0, n_events, n_events).astype(np.int64)
    old_ids = rng.integers(0, n_base, n_events).astype(np.int64)
    order_id = np.where(op == "I", new_ids, old_ids)
    status = _ORDER_STATUSES[rng.integers(0, len(_ORDER_STATUSES), n_events)]
    amount = rng.integers(100, 1_000_000, n_events).astype(np.int64)
    region = _REGIONS[order_id % len(_REGIONS)]
    ts = _EPOCH_US + 5_000_000_000 + lsn * 1_000_000
    # double-active marker: ~15% of events were written locally BY the
    # replication engine applying the peer lake's changes (the
    # _tap_double_active transaction tag, MysqlReader.java:576-590); a
    # source feeding the peer must drop them or changes echo forever
    origin = np.where(rng.random(n_events) < 0.15, "peer-engine", None)

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "order_id": order_id,
            "status": status,
            "amount_cents": amount,
            "region": region,
            "ts": ts.view("datetime64[us]"),
            "schema_ver": np.int32(1),
            "ddl_payload": None,
            "txn_origin": origin,
        }
    )
    is_d = df["op"].to_numpy() == "D"
    for col in ("status", "region"):
        df.loc[is_d, col] = None
    df.loc[is_d, "amount_cents"] = np.nan
    df.loc[is_d, "ts"] = pd.NaT
    df = _dup_and_disorder(df, rng, dup_frac=0.05, window=256)
    df["amount_cents"] = df["amount_cents"].astype("Int64")
    events_schema = pa.schema(
        [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
        + list(ORDERS_SCHEMA)
        + [pa.field("schema_ver", pa.int32()), pa.field("ddl_payload", pa.string()),
           pa.field("txn_origin", pa.string())]
    )
    events = pa.Table.from_pandas(
        df[[f.name for f in events_schema]], schema=events_schema, preserve_index=False
    )
    return base, events


def generate_clicks_events(n_events: int = 8_000, seed: int = 11) -> pa.Table:
    """No-PK append log: I rows insert full row images, D rows re-emit the
    image of an EARLIER event (delete-by-content — the only delete a no-PK
    table supports; nulls in ``uid`` must match null-safely)."""
    rng = np.random.default_rng(seed)
    uid_pool = np.concatenate(
        [np.char.add("u", np.arange(300).astype(str)).astype(object), [None] * 30]
    )
    uid = uid_pool[rng.integers(0, len(uid_pool), n_events)]
    page = np.char.add("/page/", rng.integers(0, 50, n_events).astype(str))
    n = rng.integers(0, 10, n_events).astype(np.int64)
    op = np.where(rng.random(n_events) < 0.75, "I", "D")
    op[0] = "I"
    # a delete re-emits the image of a uniformly-random earlier event
    j = (rng.random(n_events) * np.arange(n_events)).astype(np.int64)
    is_d = op == "D"
    uid = np.where(is_d, uid[j], uid)
    page = np.where(is_d, page[j], page)
    n = np.where(is_d, n[j], n)
    df = pd.DataFrame(
        {
            "lsn": np.arange(1, n_events + 1, dtype=np.int64),
            "op": op,
            "uid": uid,
            "page": page,
            "n": n,
            "schema_ver": np.int32(1),
            "ddl_payload": None,
        }
    )
    df = _dup_and_disorder(df, rng, dup_frac=0.04, window=128)
    events_schema = pa.schema(
        [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
        + list(CLICKS_SCHEMA)
        + [pa.field("schema_ver", pa.int32()), pa.field("ddl_payload", pa.string())]
    )
    return pa.Table.from_pandas(
        df[[f.name for f in events_schema]], schema=events_schema, preserve_index=False
    )


# fixed-size transcripts table for the multi-table interleaved log (tier-
# independent, like every fixture in second/ — oracle SQL stays constant)
MULTILOG_TRANSCRIPTS_SPEC = FixtureSpec(
    n_convs=500, mean_turns=8, n_events=18_000, seed=23
)


def interleave_multilog(t_events: pa.Table, o_events: pa.Table) -> pa.Table:
    """ONE interleaved CDC stream carrying two tables' events — the
    reference's multi-table sync task (one binlog serves every table; events
    are dispatched per-table downstream, ``MysqlReader`` tails a single
    stream for the whole task's table set).

    Each row is tagged ``table_name``; a single GLOBAL ``lsn`` replaces the
    per-table ones (assigned by merging each table's LSN order on normalized
    position, so per-table relative order — the only thing CDC guarantees —
    is preserved).  Columns are unioned; a row leaves the other table's
    columns NULL.  Each table's out-of-order file delivery is preserved by
    interleaving the original FILE orders, not LSN order."""
    t = t_events.append_column(
        "table_name", pa.array(np.full(len(t_events), "transcripts", object), pa.string())
    )
    o = o_events.append_column(
        "table_name", pa.array(np.full(len(o_events), "orders", object), pa.string())
    )
    names = list(t.schema.names) + [n for n in o.schema.names if n not in t.schema.names]

    def widen(tb: pa.Table) -> pa.Table:
        for n in names:
            if n not in tb.column_names:
                src = t if n in t.column_names else o
                tb = tb.append_column(n, pa.nulls(len(tb), src.schema.field(n).type))
        return tb.select(names)

    ml = pa.concat_tables([widen(t), widen(o)])
    tl = t_events["lsn"].to_numpy()
    ol = o_events["lsn"].to_numpy()
    pos = np.concatenate([tl / (tl.max() + 1.0), ol / (ol.max() + 1.0)])
    order = np.argsort(pos, kind="stable")
    glsn = np.empty(len(pos), np.int64)
    glsn[order] = np.arange(1, len(pos) + 1)
    ml = ml.set_column(ml.schema.get_field_index("lsn"), "lsn", pa.array(glsn))
    fpos = np.concatenate(
        [(np.arange(len(tl)) + 0.5) / len(tl), (np.arange(len(ol)) + 0.5) / len(ol)]
    )
    return ml.take(np.argsort(fpos, kind="stable"))


def ensure_second_fixtures(root: str = DEFAULT_FIXTURE_ROOT) -> str:
    """Fixed-size second-table fixtures (conformance surface, not bench):
    ``<root>/second/{orders_base,orders_events,clicks_events,
    mt_transcripts_base,multilog}.parquet``."""
    out = os.path.join(root, "second")
    meta_path = os.path.join(out, "meta.json")
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                if json.load(f).get("version") == SECOND_FIXTURE_VERSION:
                    return out
        except (json.JSONDecodeError, OSError):
            pass
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    base, events = generate_orders_tables()
    clicks = generate_clicks_events()
    mt_base, mt_events = generate_fixture_tables(MULTILOG_TRANSCRIPTS_SPEC)
    _write_sharded(base, os.path.join(tmp, "orders_base.parquet"))
    _write_sharded(events, os.path.join(tmp, "orders_events.parquet"))
    _write_sharded(clicks, os.path.join(tmp, "clicks_events.parquet"))
    _write_sharded(mt_base, os.path.join(tmp, "mt_transcripts_base.parquet"))
    _write_sharded(
        interleave_multilog(mt_events, events), os.path.join(tmp, "multilog.parquet")
    )
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"version": SECOND_FIXTURE_VERSION}, f)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


PARTITIONED_FIXTURE_VERSION = 1
PARTITIONED_CHILDREN = ("orders_p0", "orders_p1", "orders_p2")


def ensure_partitioned_fixture(root: str = DEFAULT_FIXTURE_ROOT) -> str:
    """Partitioned-SOURCE table fixture: the orders change log re-tagged so
    every event carries one of three CHILD partition names
    (``orders_p{order_id % 3}`` — hash routing, the Postgres partitioned-
    table shape where the binlog/WAL reports sub-partition relations while
    the sync task declares only the parent,
    ``PostgresCdcRunner.java:316-366``).  The parent's base snapshot rides
    along; a replay must fold the children back into ONE parent table."""
    out = os.path.join(root, "partitioned")
    meta_path = os.path.join(out, "meta.json")
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                if json.load(f).get("version") == PARTITIONED_FIXTURE_VERSION:
                    return out
        except (json.JSONDecodeError, OSError):
            pass
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    base, events = generate_orders_tables()
    child = np.asarray(PARTITIONED_CHILDREN, object)[
        (events["order_id"].to_numpy() % len(PARTITIONED_CHILDREN)).astype(np.int64)
    ]
    events = events.append_column("table_name", pa.array(child, pa.string()))
    _write_sharded(base, os.path.join(tmp, "orders_base.parquet"))
    _write_sharded(events, os.path.join(tmp, "partlog.parquet"))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"version": PARTITIONED_FIXTURE_VERSION}, f)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


# ---------------------------------------------------------------------------
# Patch-update log: field-level partial updates (the MongoDB $set/$unset
# surface, MongodbWriter.java:380-432) over the transcripts base.
# ---------------------------------------------------------------------------

PATCH_FIXTURE_VERSION = 1
PATCH_FIELDS = ("role", "text", "tool", "turn_score")


DIRTY_FIXTURE_VERSION = 1


def ensure_dirty_fixture(sf: str = "sf0.001", root: str = DEFAULT_FIXTURE_ROOT) -> str:
    """The tier's event log with seeded MALFORMED rows appended (unknown op
    codes; DML with NULL keys) — the dead-letter-routing input.  A tolerant
    replay over this log must equal the clean replay; the DLQ view counts
    the quarantined rows by reason."""
    d = ensure_fixtures(sf, root)
    out_dir = os.path.join(d, "dirty_events.parquet")
    marker = os.path.join(out_dir, f".v{DIRTY_FIXTURE_VERSION}")
    if os.path.exists(marker):
        return out_dir
    events = pq.read_table(os.path.join(d, "events.parquet"))
    max_lsn = int(pa.compute.max(events["lsn"]).as_py())
    n_bad_op, n_null_key = 120, 80
    n = n_bad_op + n_null_key
    rng = np.random.default_rng(20260818)
    bad = pa.Table.from_pylist(
        [
            {
                "lsn": max_lsn + 1 + i,
                "op": "X" if i < n_bad_op else "U",
                "conv_id": f"conv-{i}" if i < n_bad_op else None,
                "turn_idx": int(rng.integers(0, 5)),
                "role": "user",
                "text": "malformed",
                "schema_ver": 5,
            }
            for i in range(n)
        ],
        schema=events.schema,
    )
    _write_sharded(pa.concat_tables([events, bad]), out_dir)
    open(marker, "w").close()
    return out_dir


INSPECT_FIXTURE_VERSION = 1


def ensure_inspect_fixture(sf: str = "sf0.001", root: str = DEFAULT_FIXTURE_ROOT) -> str:
    """Deterministic "peer lake" for the inspect/diff verification query: the
    tier's expected final state with seeded discrepancies — dropped keys
    (peer_missing), corrupted ``text`` / bumped ``turn_score``
    (field_mismatch, possibly multi-field), and ghost rows (peer_only)."""
    d = ensure_fixtures(sf, root)
    out_dir = os.path.join(d, "peer_final.parquet")
    marker = os.path.join(out_dir, f".v{INSPECT_FIXTURE_VERSION}")
    if os.path.exists(marker):
        return out_dir
    from tapdata_connectors_ray.functions.hashing import md5_number_lower
    from tapdata_connectors_ray.oracle import expected_final_state
    from tapdata_connectors_ray.schema import LATEST_TRANSCRIPTS_SCHEMA

    base = pq.read_table(os.path.join(d, "transcripts.parquet"))
    events = pq.read_table(os.path.join(d, "events.parquet"))
    exp = expected_final_state(base, events).to_pandas()
    h = md5_number_lower(
        (exp["conv_id"].astype(str) + "|" + exp["turn_idx"].astype(str)).tolist()
    )
    keep = (h % np.uint64(97)) != 0
    peer = exp[keep].copy()
    hk = h[keep]
    corrupt = (hk % np.uint64(89)) == 1
    bump = (hk % np.uint64(83)) == 2  # may overlap `corrupt` -> multi-field
    peer.loc[corrupt, "text"] = peer.loc[corrupt, "text"].fillna("") + " ~peer"
    bump_nonnull = bump & peer["turn_score"].notna().to_numpy()
    peer.loc[bump_nonnull, "turn_score"] = peer.loc[bump_nonnull, "turn_score"] + 1
    ghosts = pd.DataFrame(
        {
            "conv_id": [f"ghost-{i}" for i in range(25)],
            "turn_idx": pd.array(np.arange(25, dtype=np.int32), dtype="Int32"),
            "role": "assistant",
            "text": "ghost row",
            "tool_name": None,
            "turn_score": pd.array(np.arange(25), dtype="Int64"),
            "ts": pd.Timestamp("2024-01-01 00:00:00"),
        }
    )
    peer = pd.concat([peer, ghosts], ignore_index=True)
    table = pa.Table.from_pandas(
        peer, schema=LATEST_TRANSCRIPTS_SCHEMA, preserve_index=False
    )
    _write_sharded(table, out_dir)
    open(marker, "w").close()
    return out_dir


def ensure_patch_fixture(sf: str = "sf0.001", root: str = DEFAULT_FIXTURE_ROOT) -> str:
    """Deterministic partial-update log next to the tier's base snapshot:
    one row per patch — key columns always present, one NULLABLE column per
    patchable field (NULL = not touched by this patch), ``unset_cols`` = the
    removedFields list (never a field also set in the same patch, mirroring
    ``wrapUnset``'s exclusion)."""
    d = ensure_fixtures(sf, root)
    out_dir = os.path.join(d, "patches.parquet")
    marker = os.path.join(out_dir, f".v{PATCH_FIXTURE_VERSION}")
    if os.path.exists(marker):
        return out_dir
    base = pq.read_table(
        os.path.join(d, "transcripts.parquet"), columns=["conv_id", "turn_idx"]
    ).to_pandas()
    rng = np.random.default_rng(20260817)
    n = len(base)
    pick = rng.integers(0, n, n)
    roles = np.array(["user", "assistant", "system", "tool"])
    r = rng.random((n, 6))
    p_role = pd.Series(roles[rng.integers(0, 4, n)]).where(pd.Series(r[:, 0] < 0.25), None)
    p_text = pd.Series(
        np.char.add("patched text ", rng.integers(0, 10_000, n).astype(str))
    ).where(pd.Series(r[:, 1] < 0.5), None)
    p_tool = pd.Series(
        np.char.add("tool-", rng.integers(0, 50, n).astype(str))
    ).where(pd.Series(r[:, 2] < 0.2), None)
    p_score = pd.array(
        np.where(r[:, 3] < 0.4, rng.integers(0, 100, n), -1), dtype="Int64"
    )
    p_score = pd.Series(p_score).where(pd.Series(r[:, 3] < 0.4), None)
    # removedFields: unset tool / turn_score occasionally, never when also set
    unset_tool = (r[:, 4] < 0.10) & p_tool.isna()
    unset_score = (r[:, 5] < 0.08) & p_score.isna()
    unset_cols = pd.Series(
        np.select(
            [unset_tool & unset_score, unset_tool, unset_score],
            ["tool,turn_score", "tool", "turn_score"],
            default=None,
        )
    )
    patches = pa.table(
        {
            "lsn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "conv_id": pa.array(base["conv_id"].to_numpy()[pick]),
            "turn_idx": pa.array(base["turn_idx"].to_numpy()[pick], pa.int32()),
            "p_role": pa.array(p_role, pa.string()),
            "p_text": pa.array(p_text, pa.string()),
            "p_tool": pa.array(p_tool, pa.string()),
            "p_turn_score": pa.array(p_score, pa.int64()),
            "unset_cols": pa.array(unset_cols, pa.string()),
        }
    )
    _write_sharded(patches, out_dir)
    open(marker, "w").close()
    return out_dir


class RateControlledProducer:
    """Throttled synthetic change-stream producer — the dummy connector's
    ``IRate``/``Rate.java`` generator (``DummyConnector.java:190-234``)
    re-expressed as a segment-file writer for the live tailer's soak path.

    A token budget derived from the injected clock throttles emission:
    ``produce_wave()`` writes AT MOST ``(elapsed × events_per_sec) -
    already_emitted`` events, in LSN order, as one immutable segment file —
    the shape a CDC writer lands for :class:`~.livetail.LogTailer`.  The
    clock is injectable so soak tests drive waves deterministically without
    wall-clock sleeps; production passes ``time.monotonic``."""

    def __init__(
        self,
        events: pa.Table,
        out_dir: str | None,
        events_per_sec: float,
        clock=None,
        sink=None,
    ):
        """``sink`` switches the producer from segment-FILE emission to PUSH
        mode: each due wave is handed to ``sink(chunk)`` (e.g. a receiver
        actor's enqueue) instead of landing on disk — the generator side of
        the push-based live tail (``livetail.PushProducer``)."""
        import time

        self.events = events.sort_by("lsn")
        self.out_dir = out_dir
        self.rate = float(events_per_sec)
        self.clock = clock if clock is not None else time.monotonic
        self.sink = sink
        self.t0 = self.clock()
        self.emitted = 0
        self.segments = 0
        if sink is None:
            if out_dir is None:
                raise ValueError("file mode needs out_dir; push mode needs sink")
            os.makedirs(out_dir, exist_ok=True)

    def due(self) -> int:
        """Events the rate budget allows right now (the Rate.java token)."""
        budget = int((self.clock() - self.t0) * self.rate)
        return max(0, min(budget, self.events.num_rows) - self.emitted)

    def produce_wave(self) -> int:
        """Emit all currently-due events as one segment; returns the count
        (0 = the budget is exhausted for now — a live producer would sleep)."""
        n = self.due()
        if n == 0:
            return 0
        chunk = self.events.slice(self.emitted, n)
        if self.sink is not None:
            self.sink(chunk)
        else:
            path = os.path.join(self.out_dir, f"seg-{self.segments:06d}.parquet")
            pq.write_table(chunk, path)
        self.segments += 1
        self.emitted += n
        return n

    @property
    def exhausted(self) -> bool:
        return self.emitted >= self.events.num_rows


# ---------------------------------------------------------------------------
# Conversation DIMENSION fixture: a second CDC table keyed by conv_id alone,
# co-partitioned with the transcripts fact table (both hash-partition on
# conv_id), feeding the incrementally-maintained JOIN materialized view.
# The reference's analogue is a multi-table sync task whose downstream
# processor joins the tables (master/detail lookup,
# connectors-common table-map merge); here the join itself is an
# incrementally-maintained lake view.
# ---------------------------------------------------------------------------

CONVERSATIONS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("channel", pa.string()),
        pa.field("owner", pa.string()),
        pa.field("priority", pa.int64()),
    ]
)

CONVERSATIONS_SPEC = TableSpec(
    name="conversations",
    base_schema=CONVERSATIONS_SCHEMA,
    key_columns=("conv_id",),
    partition_columns=("conv_id",),
)

_DIM_CHANNELS = np.array(["web", "mobile", "api", "email", "chat"])
_DIM_OWNERS = np.array([f"agent-{i:03d}" for i in range(40)])

DIM_FIXTURE_VERSION = 2


def generate_conversation_dim_tables(
    conv_ids: np.ndarray, seed: int = 31
) -> tuple[pa.Table, pa.Table]:
    """Dimension base snapshot + I/U/D change log over the given conv-id
    universe (the fact table's conv ids, so the join is meaningful).

    ~80% of convs appear in the base; of the remainder, half are INSERTED by
    the log (late-created dimension rows) and half never exist (fact-side
    orphans -> NULL dim columns under the LEFT join).  ~6% of base convs are
    DELETED by the log (dim row removed while fact rows live on)."""
    rng = np.random.default_rng(seed)
    conv_ids = np.sort(np.asarray(conv_ids, dtype=object))
    n = len(conv_ids)
    perm = rng.permutation(n)
    n_base = int(n * 0.8)
    n_ins = int(n * 0.1)
    base_ids = np.sort(conv_ids[perm[:n_base]])
    ins_ids = conv_ids[perm[n_base : n_base + n_ins]]

    def attrs(ids: np.ndarray, r: np.random.Generator) -> dict:
        return {
            "conv_id": pa.array(ids, pa.string()),
            "channel": _DIM_CHANNELS[r.integers(0, len(_DIM_CHANNELS), len(ids))],
            "owner": _DIM_OWNERS[r.integers(0, len(_DIM_OWNERS), len(ids))],
            "priority": r.integers(0, 5, len(ids)).astype(np.int64),
        }

    base = pa.table(attrs(base_ids, rng), schema=CONVERSATIONS_SCHEMA)

    # change log: inserts for the late rows, updates over base rows
    # (re-assign owner/priority), deletes for ~6% of base rows
    n_upd = max(1, int(n_base * 0.4))
    n_del = max(1, int(n_base * 0.06))
    upd_ids = base_ids[rng.integers(0, n_base, n_upd)]
    del_ids = base_ids[rng.choice(n_base, size=n_del, replace=False)]
    ops = np.concatenate(
        [
            np.full(len(ins_ids), "I", object),
            np.full(n_upd, "U", object),
            np.full(n_del, "D", object),
        ]
    )
    ids = np.concatenate([ins_ids, upd_ids, del_ids])
    m = len(ids)
    order = rng.permutation(m)
    ops, ids = ops[order], ids[order]
    a = attrs(ids, rng)
    df = pd.DataFrame(
        {
            "lsn": np.arange(1, m + 1, dtype=np.int64),
            "op": ops,
            "conv_id": ids,
            "channel": np.asarray(a["channel"], dtype=object),
            "owner": np.asarray(a["owner"], dtype=object),
            "priority": a["priority"],
            "schema_ver": np.int32(1),
            "ddl_payload": None,
        }
    )
    is_d = df["op"].to_numpy() == "D"
    for col in ("channel", "owner"):
        df.loc[is_d, col] = None
    df["priority"] = df["priority"].astype("Int64")
    df.loc[is_d, "priority"] = pd.NA
    df = _dup_and_disorder(df, rng, dup_frac=0.04, window=64)
    events_schema = pa.schema(
        [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
        + list(CONVERSATIONS_SCHEMA)
        + [pa.field("schema_ver", pa.int32()), pa.field("ddl_payload", pa.string())]
    )
    events = pa.Table.from_pandas(
        df[[f.name for f in events_schema]], schema=events_schema, preserve_index=False
    )
    return base, events


def generate_owners_table(seed: int = 17) -> pa.Table:
    """Tiny second-level dimension (snowflake schema): owner -> team/region.
    Small enough to BROADCAST (`ray.put` once, resolved per task) — the
    honest scale answer for a dim that fits in one object."""
    rng = np.random.default_rng(seed)
    teams = np.char.add("team-", (np.arange(len(_DIM_OWNERS)) % 8).astype(str))
    region = _REGIONS[rng.integers(0, len(_REGIONS), len(_DIM_OWNERS))]
    return pa.table(
        {
            "owner": pa.array(_DIM_OWNERS, pa.string()),
            "team": pa.array(teams, pa.string()),
            "region_name": pa.array(region, pa.string()),
        }
    )


def ensure_dim_fixtures(sf: str = "sf0.001", root: str = DEFAULT_FIXTURE_ROOT) -> str:
    """Per-tier dimension fixture derived from the tier's fact fixture:
    ``<root>/dim_<sf>/{conv_base,conv_events}.parquet``.  Cache key includes
    the fact fixture's fingerprint so regenerating the fact tier regenerates
    the dimension with it."""
    fact_dir = ensure_fixtures(sf, root=root)
    with open(os.path.join(fact_dir, "meta.json")) as f:
        fact_fp = json.load(f)["fingerprint"]
    out = os.path.join(root, f"dim_{sf}")
    meta_path = os.path.join(out, "meta.json")
    key = {"version": DIM_FIXTURE_VERSION, "fact_fingerprint": fact_fp}
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                if json.load(f) == key:
                    return out
        except (json.JSONDecodeError, OSError):
            pass
    import pyarrow.dataset as pads

    def _ids(name: str) -> np.ndarray:
        col = pads.dataset(os.path.join(fact_dir, name)).to_table(
            columns=["conv_id"]
        )["conv_id"]
        # DDL rows carry null conv_id in the event log
        return pc.drop_null(pc.unique(col.combine_chunks())).to_numpy(
            zero_copy_only=False
        )

    conv_ids = np.unique(
        np.concatenate([_ids("transcripts.parquet"), _ids("events.parquet")])
    )
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    base, events = generate_conversation_dim_tables(conv_ids)
    _write_sharded(base, os.path.join(tmp, "conv_base.parquet"))
    _write_sharded(events, os.path.join(tmp, "conv_events.parquet"))
    pq.write_table(generate_owners_table(), os.path.join(tmp, "owners.parquet"))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(key, f)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out
