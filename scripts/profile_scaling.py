"""Stage-level scaling profile of the bench index build.

Runs the EXACT bench build (synthesize_corpus + build_index with
bench.py's settings) once, with Spark event logging on, then parses the
event log into per-stage rows: wall time, task count, executor run
time, GC, shuffle read/write bytes + fetch-wait/write time, input
bytes. Run it pinned at two core counts and diff the per-stage rows to
see which stage stops scaling:

    taskset -c 0-7  python scripts/profile_scaling.py 8  1000000
    taskset -c 0-31 python scripts/profile_scaling.py 32 1000000

Writes BENCH/stage_profile_<cores>c_<docs>.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
NDOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

os.environ["SPARK_GRAFT_CPUS"] = str(CORES)
os.environ.setdefault("SPARK_GRAFT_EXECUTORS", str(max(1, CORES // 8)))

EVDIR = f"/tmp/solr_spark_eventlog_{CORES}"
shutil.rmtree(EVDIR, ignore_errors=True)
os.makedirs(EVDIR, exist_ok=True)

from solr_spark.index.builder import build_index  # noqa: E402
from solr_spark.session import get_spark  # noqa: E402
from solr_spark.sources.corpus import synthesize_corpus  # noqa: E402

spark = get_spark(
    f"profile_scaling_{CORES}",
    cores=CORES,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    },
)

out = f"/dev/shm/solr_spark_bench/profile_scaling_{CORES}"
shutil.rmtree(out, ignore_errors=True)

corpus = synthesize_corpus(spark, NDOCS, seed=42).persist()
corpus.count()  # same protocol as bench.py: generation outside the window
t0 = time.time()
build_index(
    spark, corpus, out, num_buckets=16, salt_threshold=20000, num_salts=8
)
wall = time.time() - t0
print(f"build wall: {wall:.1f}s -> {NDOCS / wall:.0f} docs/s")

app_id = spark.sparkContext.applicationId
spark.stop()

# ---- parse the event log (plain file or rolling eventlog_v2 dir) ----
stages: dict[int, dict] = {}
logs: list[str] = []
for f in sorted(os.listdir(EVDIR)):
    p = os.path.join(EVDIR, f)
    if app_id not in f:
        continue
    if os.path.isdir(p):
        logs += [
            os.path.join(p, g)
            for g in sorted(os.listdir(p))
            if g.startswith("events_")
        ]
    else:
        logs.append(p)
assert logs, f"no event log for {app_id} in {EVDIR}"


def _lines():
    for lp in logs:
        with open(lp) as fh:
            yield from fh


if True:
    for line in _lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            st = stages.setdefault(sid, {"tasks": 0})
            st.update(
                name=si["Stage Name"].split(" at ")[0],
                site=si["Stage Name"],
                wall_s=round(
                    (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                    / 1000.0,
                    2,
                ),
                n_tasks=si["Number of Tasks"],
            )
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            st = stages.setdefault(sid, {"tasks": 0})
            tm = ev.get("Task Metrics") or {}
            st["tasks"] += 1
            for key, path in (
                ("run_ms", ("Executor Run Time",)),
                ("gc_ms", ("JVM GC Time",)),
                ("deser_ms", ("Executor Deserialize Time",)),
                ("cpu_ns", ("Executor CPU Time",)),
                ("sw_bytes", ("Shuffle Write Metrics", "Shuffle Bytes Written")),
                ("sw_ms_ns", ("Shuffle Write Metrics", "Shuffle Write Time")),
                ("sr_bytes", ("Shuffle Read Metrics", "Remote Bytes Read")),
                ("sr_local", ("Shuffle Read Metrics", "Local Bytes Read")),
                ("fetch_ms", ("Shuffle Read Metrics", "Fetch Wait Time")),
                ("in_bytes", ("Input Metrics", "Bytes Read")),
                ("out_bytes", ("Output Metrics", "Bytes Written")),
            ):
                v = tm
                for p in path:
                    v = v.get(p, {}) if isinstance(v, dict) else 0
                if isinstance(v, (int, float)):
                    st[key] = st.get(key, 0) + v

rows = []
for sid in sorted(stages):
    s = stages[sid]
    if "wall_s" not in s:
        continue
    rows.append(
        {
            "stage": sid,
            "name": s.get("name", "?"),
            "wall_s": s["wall_s"],
            "n_tasks": s.get("n_tasks", s["tasks"]),
            "run_s": round(s.get("run_ms", 0) / 1000.0, 1),
            "cpu_s": round(s.get("cpu_ns", 0) / 1e9, 1),
            "gc_s": round(s.get("gc_ms", 0) / 1000.0, 1),
            "shuf_write_mb": round(s.get("sw_bytes", 0) / 1e6, 1),
            "shuf_write_s": round(s.get("sw_ms_ns", 0) / 1e9, 1),
            "shuf_read_mb": round(
                (s.get("sr_bytes", 0) + s.get("sr_local", 0)) / 1e6, 1
            ),
            "fetch_wait_s": round(s.get("fetch_ms", 0) / 1000.0, 1),
            "input_mb": round(s.get("in_bytes", 0) / 1e6, 1),
            "output_mb": round(s.get("out_bytes", 0) / 1e6, 1),
        }
    )

res = {
    "cores": CORES,
    "docs": NDOCS,
    "wall_s": round(wall, 1),
    "docs_per_sec": round(NDOCS / wall, 1),
    "stages": rows,
}
dst = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH",
    f"stage_profile_{CORES}c_{NDOCS}.json",
)
with open(dst, "w") as fh:
    json.dump(res, fh, indent=1)
print("wrote", dst)
for r in rows:
    if r["wall_s"] >= 1:
        print(
            f"stage {r['stage']:>3} {r['name'][:28]:<28} wall {r['wall_s']:>7.1f}s"
            f" tasks {r['n_tasks']:>4} run {r['run_s']:>8.1f}s cpu {r['cpu_s']:>8.1f}s"
            f" gc {r['gc_s']:>6.1f}s swMB {r['shuf_write_mb']:>8.1f}"
            f" srMB {r['shuf_read_mb']:>8.1f} fetchW {r['fetch_wait_s']:>6.1f}s"
        )
