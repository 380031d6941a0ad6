"""Host-quietness micro-probe (BASELINE.md measurement protocol).

Single-threaded 2000x2000 numpy matmuls + guest load average.  The guest
cannot see host-level vCPU oversubscription in loadavg, but the matmul
floor exposes it directly: quiet windows on this box run ~0.35-0.45 s per
multiply (~35-45 GFLOP/s); the documented degraded windows ran ~1.1 s
(~14 GFLOP/s) while loadavg stayed ~1.  Benchmarks captured when the probe
is above ~0.6 s are not comparable across rounds and must be rejected
(BASELINE.md scaling attempts 7-8).

Usage: python scripts/quiet_probe.py  ->  one JSON line.
"""

import json
import os
import time

# hard-assign (not setdefault): an inherited OPENBLAS_NUM_THREADS=8 from the
# invoking shell would run the matmul multithreaded and stamp a degraded
# window as "quiet" — the calibration above only holds single-threaded
os.environ["OMP_NUM_THREADS"] = "1"
os.environ["OPENBLAS_NUM_THREADS"] = "1"
os.environ["MKL_NUM_THREADS"] = "1"

import numpy as np  # noqa: E402  (thread caps must precede the import)


def main() -> None:
    rng = np.random.default_rng(0)
    a = rng.random((2000, 2000))
    b = rng.random((2000, 2000))
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        a @ b
        times.append(round(time.perf_counter() - t0, 3))
    best = min(times[1:])  # first rep warms caches/pages
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    print(json.dumps({
        "matmul_sec": times,
        "matmul_best": best,
        "gflops": round(2 * 2000**3 / best / 1e9, 1),
        "loadavg_1m": load1,
        "verdict": "quiet" if best <= 0.6 else "degraded",
    }))


if __name__ == "__main__":
    main()
