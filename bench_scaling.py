"""Scaling-efficiency study: the same job at two parallelism levels.

Sandbox proxy for the north rule's N vs 4N executor criterion: run the
identical index-build + query suite at local[8] and local[32] on the
same input, report throughput at both and
efficiency = (throughput@32 / throughput@8) / 4. Results land in
BENCH/BASELINE.md. Each level runs in a fresh subprocess so the two
SparkSessions (master URLs differ) can't share a JVM.
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

LEVELS = [8, 32]


def run_level(cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    results = {c: run_level(c) for c in LEVELS}
    lo, hi = LEVELS
    thr = {c: results[c]["docs_per_sec"] for c in LEVELS}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    report = {
        "levels": results,
        "index_docs_per_sec": thr,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
