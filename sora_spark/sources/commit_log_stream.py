"""Streaming SOURCE over the commit-log table (Python DataSource API,
Spark 4): `spark.readStream.format("commitlog").load(path)` turns the
table's append history into micro-batches — the Delta-streaming-source
shape, completing the loop the r11 sink opened (commit_log.
exactly_once_sink): table → readStream → transform → exactly-once sink
→ table is an end-to-end exactly-once pipeline over this format.

Offsets ARE table versions. A micro-batch (start, end] reads exactly
the data directories ADDED by versions start+1..end; because data
directories are immutable and the log is append-only, replaying any
offset range after a failure yields byte-identical rows — the
determinism Structured Streaming's offset-log replay contract needs,
with no extra bookkeeping.

Non-append commits (merge_upsert / delete / optimize) rewrite data, so
their added directories are NOT new rows. Exactly like Delta's source,
the default is to FAIL loudly on them; `option("skipChangeCommits",
"true")` streams past them (their rewrites are silently ignored —
appropriate for append-mostly fact streams where merges are
compactions of history the stream already saw). `option(
"startingVersion", N)` begins at version N instead of 1.

Scale posture: partition planning is driver-side and bounded by the
commit count + file count of the NEW versions only (never the table);
each part-file becomes one InputPartition, so a batch's read
parallelism equals its file count; rows travel as Arrow record
batches (pyarrow.parquet → Spark's arrow path, no per-row Python).
The local-filesystem listing mirrors the commit-log module's POSIX
contract; an object-store port swaps the listing calls.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from sora_spark.sources.commit_log import _commit_path, table_versions

_APPEND_OPS = {"create", "append", "txn_append"}


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _read_commit(table_path: str, version: int) -> dict:
    # layout knowledge lives in commit_log; this module only folds it
    with open(_commit_path(table_path, version)) as f:
        return json.load(f)


class CommitLogStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("commitlog source requires a path")
        self.skip_changes = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.starting_version = int(options.get("startingVersion", 1))

    def initialOffset(self) -> dict:
        # offset = highest version already emitted; start BEFORE the
        # starting version so it is included in the first batch
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        vs = table_versions(self.path)
        if not vs:
            raise FileNotFoundError(
                f"commitlog source: no commit-log table at {self.path!r}"
            )
        # NEVER advance past a schema evolution: the stream's declared
        # schema was fixed at startingVersion, so the offset is capped
        # at the last pre-evolution version — everything before the
        # evolution is still delivered (a raise here would strand it),
        # the stream then idles, and a fresh checkpoint with
        # startingVersion >= the evolution picks up the new shape
        for v in vs:
            if v <= self.starting_version:
                continue
            if _read_commit(self.path, v).get("schema_evolved"):
                return {"version": v - 1}
        return {"version": vs[-1]}

    def partitions(self, start: dict, end: dict):
        parts: list[_FilePartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            entry = _read_commit(self.path, v)
            if entry.get("schema_evolved") and v > self.starting_version:
                # SAFETY NET: latestOffset() never advances past a
                # post-start evolution, so a normal run cannot plan
                # this range — only a checkpoint that already spans
                # the evolution (written before the cap existed, or
                # against a different table) lands here. Rows after
                # the evolution would be silently truncated to the
                # stream's declared schema; refuse instead.
                # (An evolution AT startingVersion is fine: schema()
                # resolves <= start, so it IS the declared schema.)
                raise ValueError(
                    f"commitlog source: version {v} evolved the table "
                    "schema; restart the stream with a fresh checkpoint "
                    "(and a fresh sink) to pick up the new columns"
                )
            op = entry.get("operation")
            if op not in _APPEND_OPS:
                if self.skip_changes:
                    continue
                raise ValueError(
                    f"commitlog source: version {v} is a data-changing "
                    f"commit ({op}); streaming reads require append-only "
                    "history — set skipChangeCommits=true to ignore "
                    "rewrites (Delta-source semantics)"
                )
            for rel in entry.get("added", []):
                for f in sorted(
                    glob.glob(
                        os.path.join(glob.escape(
                            os.path.join(self.path, rel)), "*.parquet")
                    )
                ):
                    parts.append(_FilePartition(f))
        # Spark requires >= 1 partition per batch; an empty range (or
        # an empty txn_append batch) still needs a planable no-op
        return parts or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        import pyarrow.parquet as pq

        return iter(pq.read_table(partition.path).to_batches())

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing to reclaim


class CommitLogDataSource(DataSource):
    """`format("commitlog")`: schema comes from the table's recorded
    schema as of startingVersion (the lossless schema_json parsed
    sessionlessly, simpleString DDL for pre-json commits), so readers
    never infer from data files."""

    @classmethod
    def name(cls) -> str:
        return "commitlog"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("commitlog source requires a path")
        vs = table_versions(path)
        if not vs:
            raise FileNotFoundError(
                f"commitlog source: no commit-log table at {path!r}"
            )
        # the schema AS OF startingVersion: every version the stream
        # can emit conforms to it, because a later schema_evolved
        # commit stops the stream (see partitions()). Default start=1
        # resolves to the create commit's schema.
        start = int(self.options.get("startingVersion", 1))
        entry = None
        for v in vs:
            if v > start:
                break
            c = _read_commit(path, v)
            if c.get("schema_json") or c.get("schema"):
                entry = c
        if entry is None:
            raise ValueError(
                f"commitlog source: table at {path!r} has no recorded "
                f"schema at or before version {start}"
            )
        if entry.get("schema_json"):
            # lossless and SESSIONLESS (fromJson is pure Python) —
            # schema() runs in the datasource worker with no context
            return StructType.fromJson(json.loads(entry["schema_json"]))
        # pre-json commits: return the simpleString DDL and let the
        # JVM parse the struct<...> form
        return entry["schema"]

    def streamReader(self, schema: StructType) -> CommitLogStreamReader:
        return CommitLogStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CommitLogDataSource)
