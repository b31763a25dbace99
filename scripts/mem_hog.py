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
import os
import sys

import numpy as np


def burn(parent: int) -> None:
    # die with the launcher: `kill $HOG` on the parent must not leave
    # 24 orphan memcpy loops contending every later measurement (this
    # exact leak polluted two round-4 32-core runs before the check)
    a = np.ones(48 * 1024 * 1024, dtype=np.float64)  # 384 MB
    b = np.empty_like(a)
    i = 0
    while True:
        np.copyto(b, a)
        np.copyto(a, b)
        i += 1
        if i % 8 == 0 and os.getppid() != parent:
            return


if __name__ == "__main__":
    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    me = os.getpid()
    procs = [
        mp.Process(target=burn, args=(me,), daemon=True) for _ in range(workers)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
