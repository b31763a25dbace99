"""Aggregate memory-bandwidth probe: the box's ceiling at 1..32 cores.

Why this exists: the north rule's scaling criterion (throughput
efficiency >=0.8 from N to 4N executors) is proxied on ONE shared-memory
VM by local[8] vs local[32]. On a real cluster, 4N executors bring 4x
the memory channels; on one box, 32 cores share the same channels 8
cores had. A shuffle/scan-heavy job is therefore capped not by CPU but
by how far the box's aggregate copy bandwidth scales from 8 to 32
workers. This probe measures exactly that curve with a pure memcpy
workload (numpy copyto on buffers far larger than LLC), giving the
denominator for the per-core-throughput analysis in BENCH/BASELINE.md.

Each worker process is pinned (taskset) to its own CPU and repeatedly
copies a 256 MiB source into a 256 MiB destination for ~3 s; we report
aggregate GB/s (bytes read + written) per core count.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

BUF_MB = 256
SECONDS = 3.0


def _worker(cpu: int, out_q) -> None:
    try:
        os.sched_setaffinity(0, {cpu})
    except OSError:
        pass
    n = BUF_MB * 1024 * 1024 // 8
    src = np.random.default_rng(cpu).integers(0, 1 << 62, n, dtype=np.int64)
    dst = np.empty_like(src)
    # warm up (page-fault both buffers in)
    np.copyto(dst, src)
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < SECONDS:
        np.copyto(dst, src)
        reps += 1
    dt = time.perf_counter() - t0
    # bytes moved = read src + write dst per rep
    out_q.put((cpu, reps * 2 * n * 8 / dt))


def measure(cores: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(c, q)) for c in range(cores)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(v for _, v in vals)


def main() -> None:
    out = {}
    for cores in (1, 2, 4, 8, 16, 32):
        bw = measure(cores)
        out[cores] = round(bw / 1e9, 2)
        print(f"{cores:2d} cores: {out[cores]:8.2f} GB/s aggregate "
              f"({out[cores]/cores:6.2f} GB/s per core)", flush=True)
    eff_8_32 = (out[32] / out[8]) / 4
    report = {
        "aggregate_gb_per_sec": out,
        "bw_scaling_efficiency_8_to_32": round(eff_8_32, 3),
        "buf_mb": BUF_MB,
    }
    print(json.dumps(report))
    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH",
                           "membw_probe.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
