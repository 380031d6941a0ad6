"""Semi-join winner shuffle: find per-key winning LSNs over NARROW columns,
then filter the wide payload — the text column never crosses the all-to-all.

The LWW merge only needs (key, lsn, op) to decide which event version
survives, so the replay can run in two passes:

1. **winner scan** (narrow): read just (conv_id, turn_idx, lsn, op),
   pre-reduce per block, one coarse-bucket groupby -> per-key winning
   (lsn, is_delete).  Shuffle volume = keys-per-block x 24 bytes instead of
   full rows.
2. **payload filter** (wide): stream the full log once more, keep only rows
   whose (key, lsn) equals the winner and whose key is alive; the final
   partition merge then handles only the live set (~live-keys rows), not the
   event log.

At conformance/bench scale the winner set is broadcast via ``ray.put``
(live-keys x 16 B).  The 100 TB path keeps winners distributed: both passes
share the key-hash partitioning, so pass 2 joins winners per partition
(partition-local broadcast) — the skeleton is unchanged.

Key identity is a 64-bit mix of hash(conv_id) and turn_idx; a collision
would merge two keys (p ~ n^2/2^64 — negligible below ~10^8 live keys, and
the scale path widens to 128 bits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from tapdata_connectors_ray.functions.hashing import stable_hash_strings

N_KEY_BUCKETS = 1024


def key_hashes(conv: np.ndarray, turn: np.ndarray) -> np.ndarray:
    """64-bit key identity for (conv_id, turn_idx), as int64 (Ray's sort
    shuffle is slow on uint64 keys)."""
    h = stable_hash_strings(conv)
    with np.errstate(over="ignore"):
        k = h * np.uint64(1_000_003) + turn.astype(np.int64).view(np.uint64)
    return k.view(np.int64)


WINNER_SCHEMA = pa.schema(
    [
        pa.field("khash", pa.int64()),
        pa.field("kbucket", pa.int32()),
        pa.field("lsn", pa.int64()),
        pa.field("is_del", pa.bool_()),
    ]
)


def _winner_rows(khash: np.ndarray, lsn: np.ndarray, is_del: np.ndarray) -> pa.Table:
    """Per-block pre-reduce: one (max-LSN) row per key."""
    df = pd.DataFrame({"khash": khash, "lsn": lsn, "is_del": is_del})
    df = df.sort_values("lsn", kind="stable").drop_duplicates("khash", keep="last")
    kb = (df["khash"].to_numpy().view(np.uint64) % np.uint64(N_KEY_BUCKETS)).astype(np.int32)
    return pa.table(
        {
            "khash": pa.array(df["khash"].to_numpy(), pa.int64()),
            "kbucket": pa.array(kb, pa.int32()),
            "lsn": pa.array(df["lsn"].to_numpy(), pa.int64()),
            "is_del": pa.array(df["is_del"].to_numpy(), pa.bool_()),
        },
        schema=WINNER_SCHEMA,
    )


def winner_scan_events(batch: pa.Table) -> pa.Table:
    """map_batches UDF over the narrow event-log projection."""
    batch = batch.filter(pc.not_equal(batch["op"], "DDL"))
    if len(batch) == 0:
        return WINNER_SCHEMA.empty_table()
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    lsn = batch["lsn"].to_numpy()
    is_del = np.asarray(pc.equal(batch["op"], "D"))
    return _winner_rows(key_hashes(conv, turn), lsn, is_del)


def winner_scan_base(batch: pa.Table) -> pa.Table:
    """Base snapshot rows are LSN-0 inserts."""
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(conv)
    return _winner_rows(
        key_hashes(conv, turn), np.zeros(n, np.int64), np.zeros(n, bool)
    )


def winner_reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One key bucket: global winner per key (all of a key's per-block
    winners land in the same bucket)."""
    d = df.sort_values("lsn", kind="stable").drop_duplicates("khash", keep="last")
    return d[["khash", "lsn", "is_del"]]


def collect_winner_set(winners_df: pd.DataFrame):
    """-> ray.put((sorted khash, matching winning lsn)) with dead keys
    dropped; the broadcast side of the pass-2 semi-join."""
    live = winners_df[~winners_df["is_del"]]
    kh = live["khash"].to_numpy()
    order = np.argsort(kh, kind="stable")
    return ray.put((kh[order], live["lsn"].to_numpy()[order]))


class WinnerFilter:
    """map_batches UDF (pass 2): keep rows whose (key, lsn) is the winner.
    Vectorized binary search against the broadcast winner arrays (read from
    the local object store once per task)."""

    def __init__(self, winners_ref):
        # keep the ObjectRef; resolve lazily on the worker (zero-copy from
        # the local object store) — resolving at driver-side construction
        # would serialize the arrays into every task instead
        self._ref = winners_ref
        self.kh = None
        self.lsn = None

    def _resolve(self) -> None:
        if self.kh is None:
            self.kh, self.lsn = ray.get(self._ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._resolve()
        if len(batch) == 0 or len(self.kh) == 0:
            # empty winner set = fully-deleted table -> nothing survives
            return batch.slice(0, 0)
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        lsn = batch["lsn"].to_numpy()
        k = key_hashes(conv, turn)
        pos = np.searchsorted(self.kh, k)
        pos_c = np.minimum(pos, len(self.kh) - 1)
        ok = (self.kh[pos_c] == k) & (self.lsn[pos_c] == lsn)
        return batch.take(np.nonzero(ok)[0])
