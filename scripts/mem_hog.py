"""Memory-bandwidth hog for the fair-share scaling control.

On one shared box, an 8-core pinned job still enjoys the FULL memory
bandwidth of the machine, which a real cluster's per-host 8-core
executor does not — so the single-host N-vs-4N proxy understates
scaling efficiency on bandwidth-bound stages. This hog saturates the
bus from the other cores (large ping-pong memcpy, no CPU arithmetic to
speak of), so an 8-core bench run under it sees roughly its fair 1/4
share of bandwidth — the contended-baseline control reported in
BENCH/BASELINE.md.

Usage: taskset -c 8-31 python scripts/mem_hog.py 24 &
"""

from __future__ import annotations

import multiprocessing as mp
import sys

import numpy as np


def burn() -> None:
    a = np.ones(48 * 1024 * 1024, dtype=np.float64)  # 384 MB
    b = np.empty_like(a)
    while True:
        np.copyto(b, a)
        np.copyto(a, b)


if __name__ == "__main__":
    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    procs = [mp.Process(target=burn, daemon=True) for _ in range(workers)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
