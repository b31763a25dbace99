"""Scaling-efficiency study: the same job at two parallelism levels.

Sandbox proxy for the north rule's N vs 4N executor criterion: run the
identical index-build + query suite pinned to 8 and to 32 CPUs on the
same input, report throughput at both and
efficiency = (throughput@32 / throughput@8) / 4.

Methodology notes (single shared box, unlike a real cluster):
- each level runs in its own subprocess under `taskset -c 0..N-1`, so
  "8 cores" really means 8 CPUs for the JVM, GC, shuffle AND Python
  workers (local[8] alone only limits task slots);
- each level repeats R times and keeps the best run — the box shows
  multi-x run-to-run variance from neighbors, which best-of damps;
- shuffle + index output live on tmpfs (a real cluster has per-executor
  local disks; one shared spinning vda would serialize all levels).
Results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

LEVELS = [8, 32]
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))


def run_level(cores: int) -> dict:
    # cluster-size proxy: cores/8 separate executor JVMs x 8 cores each
    # (local-cluster) — per-executor heaps/GC + inter-process shuffle,
    # the faithful single-host stand-in for N vs 4N executors
    mode = os.environ.get("SPARK_GRAFT_SCALING_MODE", "build")
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_EXECUTORS=str(max(1, cores // 8)),
        SPARK_GRAFT_BENCH_MODE=mode,
        SPARK_GRAFT_BENCH_DOCS=os.environ.get("SPARK_GRAFT_SCALING_DOCS", "1000000"),
    )
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "bench.py"]
    if shutil.which("taskset") is None:
        cmd = cmd[3:]
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if out.returncode != 0:
        # keep the FULL subprocess stderr: the root error (e.g. an
        # executor OOM) scrolls far above the shutdown noise
        errfile = f"/tmp/bench_scaling_fail_{cores}.log"
        with open(errfile, "w") as f:
            f.write(out.stderr)
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(
            f"bench.py exited {out.returncode} at {cores} cores (full stderr: {errfile})"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    runs: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for rep in range(REPEATS):
        for c in LEVELS:
            # NB: never delete the shared spark.local.dir root here — other
            # live sessions keep shuffle files under it; Spark removes its
            # own per-app blockmgr dirs on stop.
            runs[c].append(run_level(c))
            time.sleep(5)
    # query mode scales on the batched formulation (one distributed plan);
    # the concurrent-pool qps is also recorded per level for the p50 view
    key = (
        "qps_batch"
        if os.environ.get("SPARK_GRAFT_SCALING_MODE", "build") == "query"
        else "docs_per_sec"
    )
    best = {c: max(rs, key=lambda r: r[key]) for c, rs in runs.items()}
    lo, hi = LEVELS
    thr = {c: best[c][key] for c in LEVELS}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    report = {
        "levels": best,
        f"all_{key}": {c: [r[key] for r in rs] for c, rs in runs.items()},
        f"index_{key}": thr,
        "scaling_efficiency": round(eff, 3),
        "repeats": REPEATS,
        "mode": key,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
