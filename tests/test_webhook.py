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
