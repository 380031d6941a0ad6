"""Partitioned-log source (the Kafka-shaped ingest contract).

The reference consumes Kafka topics as tables with a per-topic-partition
offset map and ordering guaranteed only within a partition
(``KafkaEnhancedConnector.java:79-83``, ``KafkaConcurrentReadMode.java``,
survey §2.1).  The lake-side analogue: a topic directory with one
``partition=<k>/`` subdirectory per log partition, each holding ordered
segment files; the consumer keeps one segment-offset map PER partition and
every poll ingests only each partition's new segments.

Ray mapping: one read task per new segment — partition-parallel by
construction; cross-partition ordering is (correctly) not promised, which is
exactly the contract the LSN-based LWW merge downstream absorbs.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data

from tapdata_connectors_ray.sources.files import FileSourceOffset, scan_new_files


class PartitionedLogOffset:
    """partition id -> FileSourceOffset (the per-topic-partition offset map)."""

    def __init__(self, parts: dict[int, FileSourceOffset] | None = None):
        self.parts = parts or {}

    def to_json(self) -> str:
        return json.dumps({str(k): json.loads(v.to_json()) for k, v in self.parts.items()})

    @classmethod
    def from_json(cls, s: str) -> "PartitionedLogOffset":
        d = json.loads(s)
        return cls(
            {
                int(k): FileSourceOffset(
                    {p: (int(a), int(b)) for p, (a, b) in v.items()}
                )
                for k, v in d.items()
            }
        )


def list_partitions(topic_dir: str) -> list[int]:
    out = []
    for name in os.listdir(topic_dir):
        if name.startswith("partition="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def poll_topic(
    topic_dir: str,
    offset: PartitionedLogOffset | None = None,
    suffixes: tuple[str, ...] = (".parquet",),
) -> tuple[list[str], PartitionedLogOffset]:
    """One consumer poll: new segments across ALL partitions + advanced
    offset map.  Segments of different partitions interleave freely
    (partition-parallel read); within a partition the sorted listing
    preserves append order."""
    offset = offset or PartitionedLogOffset()
    fresh: list[str] = []
    new_parts: dict[int, FileSourceOffset] = dict(offset.parts)
    for pid in list_partitions(topic_dir):
        pdir = os.path.join(topic_dir, f"partition={pid}")
        files, nxt = scan_new_files(pdir, offset.parts.get(pid), suffixes=suffixes)
        fresh.extend(files)
        new_parts[pid] = nxt
    return fresh, PartitionedLogOffset(new_parts)


def read_topic_segments(files: list[str]) -> ray.data.Dataset:
    if not files:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_parquet(files)


# the reference's MqOp envelope tags (constant/MqOp.java): every produced
# message carries its DML kind so a consumer can apply without diffing
_MQ_OPS = {"I": "insert", "U": "update", "D": "delete"}


def write_topic_dataset(
    ds: ray.data.Dataset,
    topic_dir: str,
    partition_key_col: str,
    n_partitions: int = 8,
    rows_per_segment: int = 65_536,
    op_col: str = "op",
) -> ray.data.Dataset:
    """Distributed MQ producer sink — the replicate-OUT direction of the
    partitioned-log contract (``AbstractMqService`` produce path +
    ``BatchPusher.java:15-42`` size/delay batching, re-expressed as a
    ``map_batches`` sink that parallelizes with the stream; nothing funnels
    through the driver):

    - **op-tag envelope**: rows gain ``mq_op`` (insert/update/delete — the
      ``MqOp.java`` analogue) from ``op_col`` when present;
    - **per-key routing**: stable key hash -> one partition per key, so a
      key's history lands in ONE partition (Kafka's ordering unit);
    - **size+delay batching**: the segment size is the size knob (one
      segment per task per touched partition, split at
      ``rows_per_segment``); the streaming executor's batch cadence is the
      delay knob — a slow trickle flushes small segments, a firehose
      flushes full ones;
    - **ordering**: segment names embed the segment's min LSN when an
      ``lsn`` column exists, so a sorted listing approximates append order;
      cross-task interleave within a partition is absorbed by the LSN-based
      LWW merge downstream (the same contract as the read side);
    - **delivery**: AT-LEAST-ONCE under task retry (a retried producer task
      re-emits its segments under fresh names — exactly Kafka's produce
      retry), absorbed by the consumer's LSN dedup/LWW the way every
      at-least-once channel in this engine is; the round-trip property test
      replays a dup-LSN feed through the topic and still matches.

    Returns the segment manifest (partition, file, rows) as a Dataset —
    metadata-scale; materialize it to drive the sink."""
    import uuid as _uuid

    import numpy as np
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.functions.hashing import stable_hash_strings

    for pid in range(n_partitions):
        os.makedirs(os.path.join(topic_dir, f"partition={pid}"), exist_ok=True)

    def produce(batch: pa.Table) -> pa.Table:
        if op_col in batch.column_names:
            # unknown ops (a raw log's DDL rows, future kinds) tag "unknown"
            # rather than masquerading as inserts — the consumer decides
            ops = batch[op_col].to_pandas().map(_MQ_OPS).fillna("unknown")
            tags = pa.array(ops.to_numpy(object), pa.string())
        else:
            tags = pa.array(np.full(batch.num_rows, "insert", object), pa.string())
        batch = batch.append_column("mq_op", tags)
        keys = batch[partition_key_col].to_numpy(zero_copy_only=False)
        pids = (
            stable_hash_strings(keys.astype(str)) % np.uint64(n_partitions)
        ).astype(np.int64)
        rows = []
        for pid in np.unique(pids):
            part = batch.filter(pa.array(pids == pid))
            pdir = os.path.join(topic_dir, f"partition={int(pid)}")
            os.makedirs(pdir, exist_ok=True)  # task may land on a fresh node
            for j in range(0, part.num_rows, rows_per_segment):
                chunk = part.slice(j, rows_per_segment)
                if "lsn" in chunk.column_names and chunk.num_rows:
                    import pyarrow.compute as pc

                    stamp = f"{pc.min(chunk['lsn']).as_py():012d}"
                else:
                    stamp = "0" * 12
                path = os.path.join(
                    pdir, f"seg-{stamp}-{_uuid.uuid4().hex[:12]}.parquet"
                )
                pq.write_table(chunk, path)
                rows.append(
                    {"partition": int(pid), "file": path, "rows": chunk.num_rows}
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("partition", pa.int64()), ("file", pa.string()), ("rows", pa.int64())]
            ),
        )

    return ds.map_batches(produce, batch_format="pyarrow", zero_copy_batch=True)


def write_topic(
    table: pa.Table,
    topic_dir: str,
    partition_key_col: str,
    n_partitions: int = 4,
    rows_per_segment: int = 8192,
) -> None:
    """Test/fixture producer: hash-route rows by key into partition dirs,
    append order == table order within each partition (Kafka's per-key
    ordering guarantee)."""
    import numpy as np
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.functions.hashing import stable_hash_strings

    keys = table[partition_key_col].to_numpy(zero_copy_only=False)
    pids = (stable_hash_strings(keys.astype(str)) % np.uint64(n_partitions)).astype(int)
    for pid in range(n_partitions):
        part = table.filter(pa.array(pids == pid))
        pdir = os.path.join(topic_dir, f"partition={pid}")
        os.makedirs(pdir, exist_ok=True)
        existing = len([f for f in os.listdir(pdir) if f.endswith(".parquet")])
        for j in range(0, max(part.num_rows, 1), rows_per_segment):
            chunk = part.slice(j, rows_per_segment)
            if chunk.num_rows == 0 and j > 0:
                break
            pq.write_table(
                chunk,
                os.path.join(
                    pdir, f"seg-{existing + j // rows_per_segment:06d}.parquet"
                ),
            )
