"""Table maintenance: small-file compaction.

At 100 TB the classic failure mode of streaming/partitioned ingestion
is millions of KB-sized parquet files — every scan pays per-file open
cost and the driver pays listing cost. `compact_parquet` rewrites a
parquet directory into ~target-sized files: read (one job), coalesce
to ceil(bytes/target) output files, write to a sibling tmp dir, then
atomically swap. The swap is a local-FS rename; on object stores the
same flow applies with the store's rename/commit primitive (documented
caveat, not abstracted here).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _n_data_files(path: str) -> int:
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite `path` into ceil(total_bytes/target) files; returns
    {"files_before", "files_after", "bytes"}. Uses coalesce (no
    shuffle — merges input splits) since compaction only reduces file
    count; row order within files is not part of the parquet contract."""
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    # recover from a previous crashed run (review finding, round 2):
    # crash between the two renames leaves data at _old and nothing at
    # `path` — restore it; any remaining _old/_tmp is then dead state
    if os.path.isdir(old) and not os.path.isdir(path):
        os.rename(old, path)
    for stale in (old, tmp):
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    before = _n_data_files(path)
    total = _dir_bytes(path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": before,
        "files_after": _n_data_files(path),
        "bytes": total,
    }
