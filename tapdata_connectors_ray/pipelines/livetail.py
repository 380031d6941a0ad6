"""Live log tail: directory polling -> checkpointed epoch ingest.

The ``streamRead`` phase of the reference engine loop (survey §3.1 step 5:
Debezium poll thread -> consumer callback -> writeRecord) re-expressed for a
lake: a CDC writer lands immutable log-segment files; the tailer polls the
directory (the file connector's 60 s polling stream,
``FileConnector.java:146-189``), and each poll wave of new segments becomes
one checkpointed ingest epoch (offset commit cadence = poll cadence,
``MysqlReader.java:363-364``).

Crash safety: the file offset (known-segment map) is persisted NEXT TO the
lake manifest but is only advanced AFTER the manifest commit; a crash
between ingest and offset write re-ingests the wave, and the LSN watermark
dedup makes that a no-op (exactly-once, survey §2.7).
"""

from __future__ import annotations

import json
import os

import ray.data

from tapdata_connectors_ray.pipelines.incremental import CheckpointedIngest
from tapdata_connectors_ray.sources.files import FileSourceOffset, scan_new_files


class LogTailer:
    """Poll-driven incremental ingest of a growing segment directory."""

    def __init__(self, log_dir: str, lake_dir: str, num_partitions: int = 64):
        self.log_dir = log_dir
        self.lake_dir = lake_dir
        self.ingest = CheckpointedIngest(lake_dir, num_partitions=num_partitions)
        self.offset = self._load_offset()

    # -- offset persistence (FileOffset analogue) --------------------------

    def _offset_path(self) -> str:
        return os.path.join(self.lake_dir, "tail_offset.json")

    def _load_offset(self) -> FileSourceOffset:
        try:
            with open(self._offset_path()) as f:
                return FileSourceOffset.from_json(f.read())
        except (OSError, json.JSONDecodeError):
            return FileSourceOffset()

    def _save_offset(self, offset: FileSourceOffset) -> None:
        tmp = self._offset_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(offset.to_json())
        os.replace(tmp, self._offset_path())

    # -- polling loop ------------------------------------------------------

    def poll_once(self, base_path: str | list[str] | None = None) -> int:
        """One poll cycle: ingest new/modified segments as one epoch.
        Returns the number of fresh segments (0 = idle cycle)."""
        fresh, nxt = scan_new_files(self.log_dir, self.offset, suffixes=(".parquet",))
        if not fresh:
            return 0
        self.ingest.ingest(fresh, base_path, use_watermarks=False)
        # offset advances only after the manifest commit (see module doc)
        self._save_offset(nxt)
        self.offset = nxt
        return len(fresh)

    def run_until_idle(
        self, base_path: str | list[str] | None = None, max_cycles: int = 1000
    ) -> int:
        """Poll until a cycle finds nothing new (replay-mode convergence);
        a live deployment would instead sleep(poll_interval) between cycles."""
        total = 0
        for i in range(max_cycles):
            n = self.poll_once(base_path if total == 0 else None)
            if n == 0:
                break
            total += n
        return total

    def final_dataset(self) -> ray.data.Dataset:
        return self.ingest.final_dataset()


# ---------------------------------------------------------------------------
# Push-based live tail: the source PUSHES change batches into a receiver
# actor; no directory polling anywhere on the hot path.
#
# This is the in-sandbox analogue of the reference's push shapes — the HTTP
# receiver connector's supplier-driven stream (``HttpReceiverConnector.
# java:75``: events arrive on the server's thread, not a poll loop) and
# Debezium's own engine-thread push into the consumer callback
# (``MysqlReader.java:501-531``).  The receiver actor IS the listen socket:
# a bounded in-memory wave queue whose fullness is the backpressure signal
# (a full queue rejects the push; the producer retries — the TCP-window
# analogue).  The tailer PEEKS waves, spools them to a durable inbox
# (receive buffer), ACKS the receiver only after the spool lands, and
# applies each batch as ONE checkpointed ingest epoch; the applied-wave
# offset advances only AFTER the manifest commit.  Crash matrix: before ack
# → re-delivered from the queue; after ack, before commit → re-applied from
# the inbox (waves spooled before the FIRST commit defer so they apply with
# the base snapshot); duplicates dedup via wave id + the merge's LSN LWW.
# ---------------------------------------------------------------------------


@ray.remote
class PushReceiver:
    """Bounded wave queue between a pushing source and the tailer."""

    def __init__(self, max_waves: int = 64):
        from collections import deque

        self.q = deque()
        self.max_waves = max_waves
        self.next_wave = 0

    def push(self, table) -> int:
        """Enqueue one wave; returns its wave id, or -1 when the queue is
        full (backpressure — the caller must retry, nothing is dropped)."""
        if len(self.q) >= self.max_waves:
            return -1
        wid = self.next_wave
        self.next_wave += 1
        self.q.append((wid, table))
        return wid

    def drain(self, max_waves: int = 16) -> list:
        out = []
        while self.q and len(out) < max_waves:
            out.append(self.q.popleft())
        return out

    def peek(self, max_waves: int = 16) -> list:
        """Read up to ``max_waves`` WITHOUT removing them — the tailer acks
        after its durable spool, so a crash between peek and ack re-delivers
        from the queue (at-least-once; wave ids dedup downstream)."""
        return [self.q[i] for i in range(min(len(self.q), max_waves))]

    def ack(self, up_to: int) -> int:
        """Release waves with id <= ``up_to`` (they are durably spooled)."""
        n = 0
        while self.q and self.q[0][0] <= up_to:
            self.q.popleft()
            n += 1
        return n

    def pending(self) -> int:
        return len(self.q)


@ray.remote
class PushProducer:
    """Generator actor: a rate-controlled synthetic change stream PUSHED
    into the receiver (the dummy connector's Rate.java generator running on
    its own engine thread).  ``step(dt)`` advances the injected clock and
    emits the due wave — deterministic for soak tests; a live deployment
    would loop ``step(poll_interval)`` on wall time."""

    def __init__(self, events, receiver, events_per_sec: float,
                 max_push_retries: int = 500):
        import time

        from tapdata_connectors_ray.fixtures import RateControlledProducer

        self._now = 0.0

        def push_with_backpressure(chunk) -> None:
            for _ in range(max_push_retries):
                if ray.get(receiver.push.remote(chunk)) >= 0:
                    return
                time.sleep(0.01)  # full queue: wait for the tailer to drain
            raise RuntimeError("receiver backpressure timeout — tailer stalled")

        self.inner = RateControlledProducer(
            events, None, events_per_sec,
            clock=lambda: self._now, sink=push_with_backpressure,
        )

    def step(self, dt: float) -> int:
        self._now += dt
        return self.inner.produce_wave()

    def emitted_head_lsn(self) -> int:
        if self.inner.emitted == 0:
            return -1
        import pyarrow.compute as pc

        return pc.max(self.inner.events.slice(0, self.inner.emitted)["lsn"]).as_py()

    def exhausted(self) -> bool:
        return self.inner.exhausted


class PushTailer:
    """Push-driven incremental ingest: drains the receiver's wave queue —
    never lists a directory on the hot path."""

    def __init__(self, receiver, lake_dir: str, num_partitions: int = 64,
                 plan=None):
        # ``plan``: a task-DECLARED evolution plan (webhook-style sources
        # push DML in the upstream's current schema and carry no DDL rows,
        # so the schema comes from the task config, not a log scan)
        self.receiver = receiver
        self.lake_dir = lake_dir
        self.plan = plan
        self.ingest = CheckpointedIngest(lake_dir, num_partitions=num_partitions)
        self.inbox = os.path.join(lake_dir, "inbox")
        os.makedirs(self.inbox, exist_ok=True)
        self.applied_wave = self._load_offset()
        # waves spooled pre-crash before the FIRST epoch ever committed: they
        # must apply together with the caller's base snapshot, so recovery
        # defers them to the first consume_once (see _recover)
        self._deferred: list[tuple[int, str]] = []
        self._recover()

    # -- offset + durable inbox --------------------------------------------

    def _offset_path(self) -> str:
        return os.path.join(self.lake_dir, "push_offset.json")

    def _load_offset(self) -> int:
        try:
            with open(self._offset_path()) as f:
                return int(json.load(f)["applied_wave"])
        except (OSError, json.JSONDecodeError, KeyError, ValueError):
            return -1

    def _save_offset(self, wave_id: int) -> None:
        tmp = self._offset_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"applied_wave": wave_id}, f)
        os.replace(tmp, self._offset_path())

    def _wave_path(self, wave_id: int) -> str:
        return os.path.join(self.inbox, f"wave-{wave_id:06d}.parquet")

    def _spool(self, waves: list) -> list[tuple[int, str]]:
        """Land drained waves in the durable inbox (receive buffer) BEFORE
        applying — a crash after spool re-applies from here (``_recover``);
        waves at or below the applied offset are re-deliveries and drop."""
        import pyarrow.parquet as pq

        out = []
        for wid, table in waves:
            if wid <= self.applied_wave:
                continue
            path = self._wave_path(wid)
            tmp = path + ".tmp"
            pq.write_table(table, tmp)
            os.replace(tmp, path)
            out.append((wid, path))
        return out

    def _apply(self, spooled: list[tuple[int, str]],
               base_path: str | list[str] | None = None) -> int:
        if not spooled:
            return 0
        self.ingest.ingest(
            [p for _, p in spooled], base_path, use_watermarks=False,
            plan=self.plan,
        )
        # offset advances only after the manifest commit (crash between the
        # two re-applies the waves; LSN LWW makes that a no-op)
        self.applied_wave = max(wid for wid, _ in spooled)
        self._save_offset(self.applied_wave)
        for _, p in spooled:  # the inbox holds only not-yet-committed waves
            try:
                os.remove(p)
            except OSError:
                pass
        return len(spooled)

    def _recover(self) -> None:
        """Crash recovery (NOT polling): re-apply inbox waves the offset says
        never committed.  One directory scan at open, never on the hot path."""
        stale = sorted(
            (int(f[5:-8]), os.path.join(self.inbox, f))
            for f in os.listdir(self.inbox)
            if f.startswith("wave-") and f.endswith(".parquet")
        )
        pending = [(wid, p) for wid, p in stale if wid > self.applied_wave]
        if not pending:
            return
        if self.applied_wave >= 0:
            # epoch 0 committed, so the base snapshot is already folded into
            # the lake — pending waves are safe to re-apply standalone
            self._apply(pending)
        else:
            # NO epoch ever committed: applying now (base_path unknown here)
            # would advance the offset past wave 0 and the base snapshot
            # could never join it — defer to the first consume_once, which
            # carries the caller's base_path
            self._deferred = pending

    # -- the push hot path ---------------------------------------------------

    def consume_once(self, base_path: str | list[str] | None = None,
                     max_waves: int = 16) -> int:
        """Peek + spool + ack + apply one batch of pushed waves as ONE epoch.
        Returns the number of fresh waves applied (0 = nothing pending).

        The receiver is acked only AFTER the durable spool: a crash between
        peek and ack leaves the waves in the queue for re-delivery (the
        re-peeked wave overwrites the same inbox file — idempotent), so no
        acknowledged wave can be lost in the drain-to-spool window."""
        waves = ray.get(self.receiver.peek.remote(max_waves))
        spooled = self._spool(waves)
        if waves:
            ray.get(self.receiver.ack.remote(max(wid for wid, _ in waves)))
        if self._deferred:
            # recovery waves spooled before the first-ever commit join this
            # epoch (dedup by wave id: a re-pushed wave may appear in both)
            merged = dict(self._deferred)
            merged.update(dict(spooled))
            spooled = sorted(merged.items())
            self._deferred = []
        if not spooled:
            return 0
        return self._apply(spooled, base_path)

    def lag_waves(self) -> int:
        """Waves sitting in the receiver queue — the bounded-lag signal."""
        return ray.get(self.receiver.pending.remote())

    def final_dataset(self) -> ray.data.Dataset:
        return self.ingest.final_dataset()
