"""Cluster job entry point: the replay/ingest engine as a `ray job submit`
payload.

    ray job submit --working-dir . -- \
        python scripts/replay_job.py --events <log dir> --base <snapshot dir> \
            --lake /data/lake --num-partitions 1024 [--epochs 4] [--tail]

On a real cluster `ray.init(address="auto")` attaches to the running
cluster; standalone it starts a local session.  The job is resumable: it
re-opens the lake manifest and continues from the committed per-partition
watermarks, so a preempted submission is simply re-submitted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as a plain script from anywhere: the package lives one level up,
# and Ray WORKER processes need it on PYTHONPATH to deserialize the UDFs
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True, help="event-log parquet dir")
    ap.add_argument("--base", default=None, help="base snapshot parquet dir")
    ap.add_argument("--lake", required=True, help="lake output dir (manifest-owned)")
    ap.add_argument("--num-partitions", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--tail", action="store_true",
                    help="poll --events as a growing segment dir instead of one replay")
    ap.add_argument("--poll-seconds", type=float, default=10.0)
    ap.add_argument("--max-polls", type=int, default=0, help="0 = until idle")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="auto", ignore_reinit_error=True)

    t0 = time.time()
    if args.tail:
        from tapdata_connectors_ray.pipelines.livetail import LogTailer

        tailer = LogTailer(args.events, args.lake, num_partitions=args.num_partitions)
        # keep supplying the base snapshot until the first non-empty poll has
        # ingested it (an empty first poll must not drop it); on a RESUMED job
        # the ingest's per-partition watermarks make a re-supplied base a
        # no-op for every partition that already committed (see
        # BaseSnapshotToEvents watermark guard), so re-passing is safe
        base_pending = args.base
        polls = 0
        while True:
            n = tailer.poll_once(base_pending)
            polls += 1
            if n > 0:
                base_pending = None  # ingested together with this wave
            if n == 0 and (args.max_polls == 0 or polls >= args.max_polls):
                break
            if n == 0:
                time.sleep(args.poll_seconds)
        metrics = tailer.ingest.metrics()
    else:
        from tapdata_connectors_ray.pipelines.incremental import CheckpointedIngest

        ing = CheckpointedIngest(args.lake, num_partitions=args.num_partitions)
        if args.epochs > 1:
            ing.ingest_in_epochs(args.events, args.base, n_epochs=args.epochs)
        else:
            ing.ingest(args.events, args.base)
        metrics = ing.metrics()

    print(json.dumps({"elapsed_sec": round(time.time() - t0, 2), **metrics}))
    ray.shutdown()


if __name__ == "__main__":
    main()
