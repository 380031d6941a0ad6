"""Webhook (HTTP-receiver) push source: envelope decode semantics and the
end-to-end push replay (SURVEY §2.1; ``HttpReceiverConnector.java:75``,
``EventHandle.java:22-52``, ``Tags.java:44-71``)."""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tapdata_connectors_ray.schema import TRANSCRIPTS_SPEC
from tapdata_connectors_ray.sources.webhook import (
    decode_webhook_payload,
    render_webhook_envelopes,
)
from tapdata_connectors_ray.state.registry import EvolutionPlan


def _read_dir(d: str) -> pa.Table:
    import glob
    import os

    return pa.concat_tables(
        pq.read_table(p) for p in sorted(glob.glob(os.path.join(d, "*.parquet")))
    )


@pytest.fixture(scope="module")
def plan_and_events(smoke_fixture_dir):
    ev = _read_dir(smoke_fixture_dir + "/events.parquet")
    ddl = ev.filter(pc.equal(ev["op"], "DDL"))
    plan = EvolutionPlan.from_ddl_table(
        ddl.select(["lsn", "schema_ver", "ddl_payload"]), spec=TRANSCRIPTS_SPEC
    )
    return plan, ev


def _env(rec=None, recs=None, supplier="s1"):
    e = {}
    if supplier is not None:
        e["proxy_callback_supplier_id"] = supplier
    if recs is not None:
        e["proxy_callback_array_content"] = True
        e["array"] = recs
    else:
        e["proxy_callback_array_content"] = False
        e["map"] = rec
    return json.dumps(e)


def test_decode_branch_semantics(plan_and_events):
    """Every EventHandle/Tags decode branch on a hand-built wave."""
    plan, _ = plan_and_events
    recs = [
        # 0: plain insert, explicit time
        {"opType": "i", "time": 1_000_000,
         "after": {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi"}},
        # 1: unrecognized opType -> INSERT default (Tags.getOp)
        {"opType": "whatever", "time": 2_000_000,
         "after": {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "yo"}},
        # 2: missing time -> receipt-time fallback (EventHandle.java:31)
        {"opType": "u",
         "after": {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "edit"}},
        # 3: key-moving update: before marks the old key
        {"opType": "u", "time": 3_000_000,
         "after": {"conv_id": "c2", "turn_idx": 5, "role": "user", "text": "moved"},
         "before": {"conv_id": "c2", "turn_idx": 4}},
        # 4: delete — the row image IS the before (EventHandle.java:40-42)
        {"opType": "d", "time": 4_000_000,
         "before": {"conv_id": "c1", "turn_idx": 1}},
    ]
    nd = "\n".join(
        [
            # array body, 2 records; the null element (partial serialization)
            # is NOT a record and must not become a phantom all-null insert
            _env(recs=[recs[0], None, recs[1]]),
            _env(rec=recs[2]),                        # map body
            _env(rec={"opType": "i", "after": {"conv_id": "zz", "turn_idx": 9}},
                 supplier=None),                      # no supplier -> dropped
            _env(recs=recs[3:5]),                     # array body, 2 records
        ]
    )
    out, stats = decode_webhook_payload(nd, plan, base_lsn=10, receipt_time_us=777)
    assert stats == {
        "received_envelopes": 4,
        "dropped_no_supplier": 1,
        "records": 5,
    }
    assert out["lsn"].to_pylist() == [10, 11, 12, 13, 14]  # arrival order
    assert out["op"].to_pylist() == ["I", "I", "U", "U", "D"]
    ts_us = out["ts"].cast(pa.int64()).to_pylist()
    assert ts_us == [1_000_000, 2_000_000, 777, 3_000_000, 4_000_000]
    assert out["conv_id"].to_pylist() == ["c1", "c1", "c1", "c2", "c1"]
    assert out["turn_idx"].to_pylist() == [0, 1, 0, 5, 1]
    # before image: only the key-moving UPDATE populates before_*
    assert out["before_conv_id"].to_pylist() == [None, None, None, "c2", None]
    assert out["before_turn_idx"].to_pylist() == [None, None, None, 4, None]
    # unreferenced payload fields are null; schema_ver is the declared latest
    assert out["tool_name"].to_pylist() == [None] * 5
    assert out["schema_ver"].to_pylist() == [plan.latest_version] * 5
    assert out["ddl_payload"].null_count == 5


def test_render_decode_roundtrip(plan_and_events):
    """Sender-simulator -> decoder round-trips the fixture log exactly:
    kept DML rows (lsn % 101 != 0) come back value-identical in LSN order,
    with tool_name unified to the upstream's current schema."""
    plan, ev = plan_and_events
    nd = render_webhook_envelopes(ev, plan)
    out, stats = decode_webhook_payload(nd, plan, base_lsn=1, receipt_time_us=0)

    srt = ev.take(pc.sort_indices(ev, sort_keys=[("lsn", "ascending")]))
    lsn = srt["lsn"].to_numpy()
    op = srt["op"].to_numpy(zero_copy_only=False)
    keep = (op != "DDL") & (lsn % 101 != 0)
    srt = srt.filter(pa.array(keep))
    assert len(out) == len(srt) == stats["records"]
    assert stats["dropped_no_supplier"] > 0
    for col in ("op", "conv_id", "turn_idx", "role", "text", "turn_score",
                "ts", "before_conv_id", "before_turn_idx"):
        assert out[col].to_pylist() == srt[col].to_pylist(), col
    rows = srt.to_pylist()
    unified = [
        r["tool_name"] if (r["schema_ver"] or 1) >= 3 else r["tool"] for r in rows
    ]
    assert out["tool_name"].to_pylist() == unified
    # receipt LSNs are dense and ordered (the stream offset analogue)
    assert out["lsn"].to_pylist() == list(range(1, len(out) + 1))


def test_webhook_push_replay_final_state(ray_session, plan_and_events,
                                         smoke_fixture_dir, tmp_path):
    """End to end: envelopes -> receiver queue -> decode -> checkpointed
    epochs under the DECLARED plan == the oracle replay of the kept events
    (DDL rows stay in the oracle's input — the unification they describe is
    baked into the rendered payloads)."""
    import numpy as np
    import ray

    from tapdata_connectors_ray.oracle import expected_final_state
    from tapdata_connectors_ray.pipelines.livetail import PushReceiver, PushTailer

    plan, ev = plan_and_events
    base = _read_dir(smoke_fixture_dir + "/transcripts.parquet")

    nd = render_webhook_envelopes(ev, plan)
    lines = nd.splitlines(keepends=True)
    receiver = PushReceiver.remote(max_waves=8)
    tailer = PushTailer(receiver, str(tmp_path / "lake"), num_partitions=16,
                        plan=plan)
    per = (len(lines) + 1) // 2
    next_lsn = 1
    for w in range(2):
        chunk = lines[w * per : (w + 1) * per]
        batch, _ = decode_webhook_payload(
            "".join(chunk), plan, base_lsn=next_lsn, receipt_time_us=0
        )
        next_lsn += len(batch)
        ray.get(receiver.push.remote(batch))
        assert tailer.consume_once(
            smoke_fixture_dir + "/transcripts.parquet" if w == 0 else None
        ) == 1

    lsn = ev["lsn"].to_numpy()
    op = ev["op"].to_numpy(zero_copy_only=False)
    kept = ev.filter(pa.array((op == "DDL") | (lsn % 101 != 0)))
    exp = expected_final_state(base, kept).to_pandas()
    got = tailer.final_dataset().to_pandas()
    for df in (exp, got):
        df.sort_values(["conv_id", "turn_idx"], inplace=True, ignore_index=True)
        df["turn_score"] = df["turn_score"].astype("Int64")
    assert list(got.columns) == list(exp.columns)
    for c in exp.columns:
        a, b = got[c], exp[c]
        assert (a.isna() == b.isna()).all(), c
        mask = ~a.isna()
        assert (np.asarray(a[mask]) == np.asarray(b[mask])).all(), c


# ---------------------------------------------------------------------------
# Property: the Arrow-vectorized decoder == a per-record reference
# interpreter of the documented semantics (Tags.filterCallbackEvent /
# Tags.getOp / EventHandle.java:22-52) on arbitrary envelope waves.
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_TEXT = st.one_of(st.none(), st.text(max_size=8))
_AFTER = st.fixed_dictionaries(
    {},
    optional={
        "conv_id": _TEXT,
        "turn_idx": st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
        "role": _TEXT,
        "text": _TEXT,
        "tool_name": _TEXT,
        "turn_score": st.one_of(st.none(), st.integers(-(2**62), 2**62)),
    },
)
_BEFORE = st.fixed_dictionaries(
    {},
    optional={
        "conv_id": _TEXT,
        "turn_idx": st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
    },
)
_RECORD = st.fixed_dictionaries(
    {},
    optional={
        "opType": st.one_of(
            st.none(), st.sampled_from(["i", "u", "d", "create", "X", ""])
        ),
        "time": st.one_of(st.none(), st.integers(0, 4_000_000_000_000_000)),
        "after": _AFTER,
        "before": _BEFORE,
    },
)
_ENVELOPE = st.fixed_dictionaries(
    {},
    optional={
        "proxy_callback_supplier_id": st.one_of(st.none(), st.just("s1")),
        "proxy_callback_array_content": st.booleans(),
        "map": st.one_of(st.none(), _RECORD),
        "array": st.lists(st.one_of(st.none(), _RECORD), max_size=4),
    },
)


def _reference_decode(envelopes, plan, base_lsn, receipt_time_us):
    """Row-at-a-time interpreter of the documented envelope semantics —
    deliberately the OPPOSITE shape of the vectorized decoder."""
    payload = plan.schema_at()
    keys = plan.keys()
    rows, dropped = [], 0
    for env in envelopes:
        if env.get("proxy_callback_supplier_id") is None:
            dropped += 1
            continue
        if env.get("proxy_callback_array_content"):
            body = env.get("array")
            if body is None:
                continue
            recs = [r for r in body if r is not None]
        else:
            rec = env.get("map")
            if rec is None:
                continue
            recs = [rec]
        for rec in recs:
            op_raw = rec.get("opType")
            op = op_raw.upper() if op_raw in ("i", "u", "d") else "I"
            t = rec.get("time")
            after = rec.get("after") or {}
            before = rec.get("before") or {}
            row = {"op": op, "ts": t if t is not None else receipt_time_us}
            for f in payload:
                if f.name == "ts":
                    continue
                v = after.get(f.name)
                if f.name in keys and op == "D" and before.get(f.name) is not None:
                    v = before.get(f.name)
                row[f.name] = v
            for k in keys:
                row[f"before_{k}"] = before.get(k) if op == "U" else None
            rows.append(row)
    for i, row in enumerate(rows):
        row["lsn"] = base_lsn + i
    return rows, {
        "received_envelopes": len(envelopes),
        "dropped_no_supplier": dropped,
        "records": len(rows),
    }


@settings(max_examples=80, deadline=None)
@given(
    envs=st.lists(_ENVELOPE, max_size=12),
    base_lsn=st.integers(0, 1_000),
    receipt=st.integers(0, 10**9),
)
def test_decode_matches_reference_interpreter(plan_and_events, envs, base_lsn,
                                              receipt):
    plan, _ = plan_and_events
    nd = "\n".join(json.dumps(e) for e in envs)
    out, stats = decode_webhook_payload(
        nd, plan, base_lsn=base_lsn, receipt_time_us=receipt
    )
    rows, ref_stats = _reference_decode(envs, plan, base_lsn, receipt)
    assert stats == ref_stats
    assert len(out) == len(rows)
    assert out["lsn"].to_pylist() == [r["lsn"] for r in rows]
    assert out["op"].to_pylist() == [r["op"] for r in rows]
    assert out["ts"].cast(pa.int64()).to_pylist() == [r["ts"] for r in rows]
    assert out["schema_ver"].to_pylist() == [plan.latest_version] * len(rows)
    payload = plan.schema_at()
    cols = [f.name for f in payload if f.name != "ts"]
    cols += [f"before_{k}" for k in plan.keys()]
    for c in cols:
        assert out[c].to_pylist() == [r[c] for r in rows], c
