"""Snapshot-committed parquet tables — the Iceberg-shaped commit layer.

The reference treats a commit as an atomic, versioned publish (tlog +
commit -> searchers only ever see a committed view; SURVEY §3.2 names
an Iceberg table with snapshot commits as the Spark-native analogue).
This sandbox has no Iceberg/Delta jars (no network), so this module
implements the part of that contract the engine actually needs, over
plain parquet + a tiny JSON manifest log:

- WRITERS: `publish()` stages data under `data/v{N}/`, then commits by
  writing `snapshots/v{N}.json` and atomically renaming a `LATEST`
  pointer (POSIX rename). A crash mid-write leaves garbage data files
  but NO new version — readers never see a torn table.
- READERS: `read()` resolves a manifest (latest or pinned version) and
  unions exactly the data dirs it lists — a consistent view even while
  a writer is publishing.
- INCREMENTAL: `incremental_read(since_version)` returns only the rows
  added after a version — the batch-pull twin of `topic()`; the
  streaming `topic_stream` can point at `data/` and gets the same
  append-only file layout.

Manifests carry `mode`: "append" snapshots add their dirs to the
parent's view; "overwrite" snapshots replace it (the index re-publish
shape). Versions are dense integers; no timestamps (replayable builds
stamp nothing wall-clock-dependent).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _snap_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "snapshots")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_snap_dir(table_dir), f"v{version}.json")


def current_version(table_dir: str) -> int:
    """Latest committed version, or 0 if the table has none."""
    p = os.path.join(_snap_dir(table_dir), "LATEST")
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip())


def _load_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def _visible_dirs(table_dir: str, version: int) -> list[str]:
    """Data dirs composing the view at `version` (walk the parent chain
    until an overwrite snapshot or the root)."""
    dirs: list[str] = []
    v = version
    while v > 0:
        m = _load_manifest(table_dir, v)
        dirs = m["dirs"] + dirs
        if m.get("mode") == "overwrite":
            break
        v = m.get("parent", v - 1)
    return dirs


def publish(
    table_dir: str,
    df: DataFrame,
    mode: str = "append",
    n_rows: int | None = None,
) -> int:
    """Write `df` as a new committed snapshot; returns the new version.

    The data write targets an uncommitted `data/v{N}` dir; the commit
    is the manifest write + LATEST rename at the end. Readers resolve
    through LATEST, so they switch from v{N-1} to v{N} atomically.

    `n_rows` (when the caller already knows it) is recorded in the
    manifest — Iceberg's snapshot summary row counts — so driver-side
    planners can size the table without a Spark job (the deletes
    sidecar uses it to decide broadcast vs shuffle anti-join)."""
    version = current_version(table_dir) + 1
    rel = os.path.join("data", f"v{version}")
    df.write.mode("overwrite").parquet(os.path.join(table_dir, rel))
    return commit_version(table_dir, [rel], mode=mode, n_rows=n_rows)


def total_rows(table_dir: str, version: int | None = None) -> int | None:
    """Sum of manifest-recorded row counts over the visible chain at
    `version` (default latest), or None if any visible manifest lacks a
    count (pre-counting writers) — callers must treat None as unknown,
    not zero. Pure driver-side metadata reads."""
    v = current_version(table_dir) if version is None else version
    total = 0
    while v > 0:
        m = _load_manifest(table_dir, v)
        if m.get("n_rows") is None:
            return None
        total += int(m["n_rows"])
        if m.get("mode") == "overwrite":
            break
        v = m.get("parent", v - 1)
    return total


def commit_version(
    table_dir: str, dirs: list[str], mode: str = "append",
    n_rows: int | None = None,
) -> int:
    """Register already-written relative dirs as a new committed
    version (the commit half of `publish`, for artifacts the caller
    writes itself — e.g. a whole index build)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append/overwrite, got {mode!r}")
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    parent = current_version(table_dir)
    version = parent + 1
    manifest = {
        "version": version,
        "parent": parent,
        "mode": mode,
        "dirs": list(dirs),
    }
    if n_rows is not None:
        manifest["n_rows"] = int(n_rows)
    mp = _manifest_path(table_dir, version)
    with open(mp + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(mp + ".tmp", mp)
    lp = os.path.join(_snap_dir(table_dir), "LATEST")
    with open(lp + ".tmp", "w") as f:
        f.write(str(version))
    os.rename(lp + ".tmp", lp)  # the atomic commit point
    return version


def build_index_versioned(spark, corpus, table_root: str, **build_kw):
    """Build an index into `versions/v{N}` of a snapshot table and
    commit it as an overwrite snapshot: searchers loading through
    `load_index_snapshot` keep serving the previous version until the
    rename lands, then switch whole — the commit/openSearcher contract
    (DirectUpdateHandler2.commit -> new searcher on a complete view),
    with old versions retained for pinned readers."""
    from solr_spark.index.builder import build_index

    v_next = current_version(table_root) + 1
    rel = os.path.join("versions", f"v{v_next}")
    idx = build_index(
        spark, corpus, os.path.join(table_root, rel), **build_kw
    )
    commit_version(table_root, [rel], mode="overwrite")
    return idx


def load_index_snapshot(spark, table_root: str, version: int | None = None):
    """Load the committed index at `version` (default latest)."""
    from solr_spark.index.builder import Index

    v = current_version(table_root) if version is None else version
    if v <= 0:
        raise FileNotFoundError(f"no committed index in {table_root}")
    dirs = _visible_dirs(table_root, v)
    return Index.load(spark, os.path.join(table_root, dirs[-1]))


def read(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The committed view at `version` (default: latest). Empty-table
    reads raise — callers check `current_version` first."""
    v = current_version(table_dir) if version is None else version
    if v <= 0:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    dirs = _visible_dirs(table_dir, v)
    return spark.read.parquet(*[os.path.join(table_dir, d) for d in dirs])


def incremental_read(
    spark: SparkSession, table_dir: str, since_version: int
) -> tuple[DataFrame | None, int]:
    """(rows added after `since_version`, current version) — the
    batch-pull topic(): a consumer persists the returned version as its
    checkpoint and passes it back on the next call. Returns (None, v)
    when nothing new. Only append snapshots can be consumed
    incrementally; crossing an overwrite raises (the consumer must
    re-read the full view, same as a topic over a re-built index)."""
    cur = current_version(table_dir)
    if cur <= since_version:
        return None, cur
    new_dirs: list[str] = []
    v = cur
    while v > since_version:
        m = _load_manifest(table_dir, v)
        if m.get("mode") == "overwrite":
            raise ValueError(
                f"snapshot v{v} is an overwrite: incremental consumers "
                "must restart from a full read()"
            )
        new_dirs = m["dirs"] + new_dirs
        v = m.get("parent", v - 1)
    return (
        spark.read.parquet(*[os.path.join(table_dir, d) for d in new_dirs]),
        cur,
    )
