"""Minimal snapshot-isolated table format: a JSON commit log over
immutable parquet data directories (SURVEY §2.1/§2.9 upsert-sink
family's missing lifecycle — r10 verdict "what's missing" item 4).

Why: the qup1–qup6 upsert sinks are atomic-swap parquet merges — the
honest plain-parquet floor, but a swap destroys history and gives
readers no isolation (a reader that resolved the directory mid-swap
sees either version, and a long job can straddle both). This format is
the smallest Delta/Iceberg-shaped core that fixes both:

- DATA IS IMMUTABLE. Every commit writes its rows to a fresh
  `data/v{N}-{uuid}` parquet directory; no data file is ever modified
  or (by this module) deleted. Upserts DELIST old directories in the
  log instead of removing them.
- THE LOG IS THE TABLE. `_commits/%08d.json` entries carry
  {version, operation, added, removed}; the live file set at version V
  is the ordered fold of added/removed up to V. A snapshot is just
  that resolved list — `read_table` resolves it ONCE at call time, so
  the returned DataFrame keeps reading exactly those directories no
  matter how many commits land afterwards (snapshot isolation), and
  `version=` gives time travel for free.
- COMMITS PUBLISH ATOMICALLY, SINGLE WRITER. The entry is fully
  written to a temp name, then `os.link`ed to its final
  `%08d.json` name — link is atomic and FAILS if the version already
  exists, so two racing writers cannot both claim version N; the
  loser gets ConcurrentWriteError and should re-read and retry. This
  is optimistic concurrency for the LOCAL/POSIX filesystems this repo
  targets; object stores need a conditional-put equivalent (S3
  if-none-match / GCS generation-match), same protocol shape.

Scale posture: the log is one tiny JSON per commit and the snapshot
resolve is a driver-side directory listing bounded by commit count —
data-size independent. Reads are ordinary parquet scans of the live
directories (pushdown/pruning intact). The merge rewrite is
full-table like upsert.py — right for dimension tables; a fact-scale
merge would partition the rewrite by touched keys, same log protocol.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_COMMITS = "_commits"
_DATA = "data"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first: re-read the table
    (your snapshot is stale) and retry the operation."""


def _commit_path(path: str, version: int) -> str:
    return os.path.join(path, _COMMITS, f"{version:08d}.json")


def table_versions(path: str) -> list[int]:
    """Committed versions, ascending. Non-commit files (tmp leftovers
    from a crashed publish) are ignored — an unpublished commit and
    its data directory are invisible by construction."""
    d = os.path.join(path, _COMMITS)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.endswith(".json") and f[:-5].isdigit():
            out.append(int(f[:-5]))
    return sorted(out)


def _read_commits(path: str, upto: int | None) -> list[dict]:
    versions = table_versions(path)
    if not versions:
        raise FileNotFoundError(f"no commit-log table at {path}")
    if upto is not None:
        if upto not in versions:
            raise ValueError(
                f"version {upto} not in table (have {versions})"
            )
        versions = [v for v in versions if v <= upto]
    commits = []
    for v in versions:
        with open(_commit_path(path, v)) as f:
            commits.append(json.load(f))
    return commits


def _live_dirs(path: str, upto: int | None) -> list[str]:
    live: list[str] = []
    for c in _read_commits(path, upto):
        for r in c.get("removed", []):
            live.remove(r)
        live.extend(c.get("added", []))
    return live


def _write_data(df: DataFrame, path: str, version: int) -> str:
    rel = os.path.join(_DATA, f"v{version:08d}-{uuid.uuid4().hex[:12]}")
    df.write.mode("error").parquet(os.path.join(path, rel))
    return rel


def _publish(path: str, entry: dict) -> int:
    """Atomically claim `entry['version']`: write the JSON fully under
    a temp name, then hard-link it to the final name — the link is
    atomic and raises if the version exists, so a loser never
    publishes a half-written or conflicting commit."""
    os.makedirs(os.path.join(path, _COMMITS), exist_ok=True)
    version = entry["version"]
    final = _commit_path(path, version)
    tmp = final + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(entry, f, sort_keys=True)
        f.write("\n")
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError as e:
        raise ConcurrentWriteError(
            f"version {version} already committed at {path}; re-read "
            "and retry"
        ) from e
    finally:
        os.unlink(tmp)
    return version


def create_table(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Version 1: initial rows. Fails if the table already has commits."""
    rel = _write_data(df, path, 1)
    return _publish(
        path,
        {"version": 1, "operation": "create", "added": [rel],
         "removed": [], "schema": df.schema.simpleString()},
    )


def append(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Append-only commit: adds a data directory, removes nothing."""
    commits = _read_commits(path, None)
    want = commits[0].get("schema")
    if want and df.schema.simpleString() != want:
        raise ValueError(
            f"append schema {df.schema.simpleString()} != table "
            f"schema {want}"
        )
    version = commits[-1]["version"] + 1
    rel = _write_data(df, path, version)
    return _publish(
        path,
        {"version": version, "operation": "append", "added": [rel],
         "removed": []},
    )


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: resolves the live directory list ONCE (here), so
    the returned DataFrame is pinned to this version even if commits
    land while it is still being consumed. `version=` time-travels."""
    dirs = _live_dirs(path, version)
    if not dirs:
        raise ValueError(f"table at {path} has no live data")
    return spark.read.parquet(*[os.path.join(path, d) for d in dirs])


def merge_upsert(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
) -> int:
    """MERGE with the qup1 semantics (latest `ts_col` per key, batch
    wins ties) as a commit: reads the current snapshot, writes the
    merged rows to a NEW data directory, and commits it while
    DELISTING every previously-live directory — old versions stay
    readable (time travel), and a concurrent commit between the
    snapshot read and the publish surfaces as ConcurrentWriteError
    instead of silently losing one writer's rows (the atomic-swap
    sink's failure mode)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    commits = _read_commits(path, None)
    want = commits[0].get("schema")
    if want and batch_df.schema.simpleString() != want:
        # same gate as append: without it a type-drifting batch would
        # be COERCED by unionByName and committed as a silently
        # different table schema, wedging later appends against the
        # stale recorded one (r11 review finding)
        raise ValueError(
            f"merge_upsert batch schema "
            f"{batch_df.schema.simpleString()} != table schema {want}"
        )
    version = commits[-1]["version"] + 1
    live = _live_dirs(path, None)
    cur = read_table(spark, path).withColumn("_src", F.lit(0))
    new = batch_df.withColumn("_src", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col("_src").desc()
    )
    merged = (
        cur.unionByName(new)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    rel = _write_data(merged, path, version)
    return _publish(
        path,
        {"version": version, "operation": "merge_upsert",
         "added": [rel], "removed": live},
    )


def vacuum(path: str, keep_versions: int = 1) -> list[str]:
    """Reclaim data directories no snapshot in the retention window
    can reach: keep everything live at any of the newest
    `keep_versions` versions; delete data dirs that are BOTH delisted
    before the window AND not referenced inside it. Time travel to
    versions older than the window stops working (their commit JSONs
    remain as provenance; reads raise on the missing dirs) — the same
    trade Delta's VACUUM makes, so the default keeps only the current
    version reachable, explicitly.

    Single-writer discipline applies: run vacuum from the (one)
    writer, never concurrently with a reader that pinned a snapshot
    older than the window — a pinned DataFrame holds paths, not locks.
    Returns the deleted relative paths. Orphan dirs from crashed
    writers (data written, commit never published) are also removed:
    they are invisible to every reader by construction."""
    import shutil

    versions = table_versions(path)
    if not versions:
        raise FileNotFoundError(f"no commit-log table at {path}")
    keep = versions[-max(keep_versions, 1):]
    reachable: set[str] = set()
    for v in keep:
        reachable.update(_live_dirs(path, v))
    ever: set[str] = set()
    for c in _read_commits(path, None):
        ever.update(c.get("added", []))
    data_root = os.path.join(path, _DATA)
    on_disk = {
        os.path.join(_DATA, d)
        for d in (os.listdir(data_root) if os.path.isdir(data_root) else [])
    }
    # committed-but-unreachable ∪ orphaned-on-disk
    doomed = sorted((ever - reachable) | (on_disk - ever))
    for rel in doomed:
        shutil.rmtree(os.path.join(path, rel), ignore_errors=True)
    return doomed
