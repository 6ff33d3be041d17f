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
- LOST RACES REBASE WHEN THE WINNER COMMUTES (r14, Delta's file-level
  conflict rules). Appends always rebase in place (blind appends
  commute; schema/CHECK re-gated). Data-changing writers (merge/
  delete/update) classify each winner via `_publish_data_change`:
  metadata changes, read-set rewrites, and deletion-vector winners
  REFUSE descriptively (commit_with_retry then re-runs the whole
  operation — the pre-r14 behavior, now reserved for true
  conflicts); winners whose added rows are provably disjoint from
  the operation's delta (recorded stats, else one delta-bounded
  scan) rebase in place — the already-written output is renamed to
  the re-claimed version, never re-read or re-written.

Scale posture: the log is one tiny JSON per commit and the snapshot
resolve is a driver-side directory listing bounded by commit count —
data-size independent. Reads are ordinary parquet scans of the live
directories (pushdown/pruning intact). MERGE is DATA-SKIPPED: commits
record per-directory min/max/null stats for declared stats columns,
and `merge_upsert` rewrites ONLY the live directories whose key
ranges can overlap the batch — untouched directories stay listed, so
the rewrite cost is proportional to the touched data, not the table
(the Delta/Iceberg file-skipping shape). Directories without stats
are conservatively treated as touched, so the pruning is always
sound; a table written without stats degrades to the full rewrite.
DELETE locates touched directories with one pushdown scan over
`_metadata.file_path` and rewrites only those — or, with
`deletion_vectors=True`, touches ZERO data directories: the matched
rows' (file, row_index) positions land in a tiny `dv/` sidecar
directory and the commit only lists it (`dv_added`); every read
anti-joins the live deletion vectors (broadcast when their recorded
row count is small), and `compact` reconciles them physically —
rewrites the survivors and DELISTS the vectors — so a one-row delete
on a 100 TB table costs one position scan + a sidecar write instead
of a directory rewrite (the Delta deletion-vector shape). `compact`
(OPTIMIZE) bin-packs the live directories into one without changing
the data.
`table_changes` is snapshot CDC. `txn_append`/`exactly_once_sink`
give Structured Streaming foreachBatch an idempotent commit keyed by
(app_id, epoch), the Delta txnAppId/txnVersion protocol shape.

SEMANTIC NOTE on pruned MERGE: with pruning, rows in untouched
directories pass through unchanged — standard MERGE INTO semantics.
The pre-r11 behavior additionally deduplicated keys duplicated WITHIN
the current table (possible only after overlapping raw `append`s);
the two agree whenever the table is key-unique, which create+merge
lifecycles guarantee. Pass `prune=False` for the full-table dedup.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_COMMITS = "_commits"
_DATA = "data"
_DV = "dv"
_CDC = "cdc"
# a data FILE's table-relative path (dir regexes elsewhere capture the
# directory; deletion vectors address individual part-files)
_FILE_RE = r"(data/v\d{8}-[0-9a-f]+(?:/_bucket=\d+)?/[^/]+)$"
# below this many live deleted positions the anti-join side is
# broadcast — a DV that outgrows it still works, it just shuffles
_DV_BROADCAST_ROWS = 10_000_000


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first: re-read the table
    (your snapshot is stale) and retry the operation."""


class ConstraintViolationError(ValueError):
    """The batch contains rows that violate the table's CHECK
    constraint: nothing was committed (the written data directory is
    an unpublished orphan — invisible to readers, reclaimed by
    vacuum)."""


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


def _latest_checkpoint_version(path: str) -> int | None:
    """Newest `%08d.ckpt.json` log checkpoint, or None."""
    d = os.path.join(path, _COMMITS)
    if not os.path.isdir(d):
        return None
    best = None
    for f in os.listdir(d):
        if f.endswith(".ckpt.json") and f.split(".")[0].isdigit():
            v = int(f.split(".")[0])
            best = v if best is None or v > best else best
    return best


def _read_state_commits(path: str) -> list[dict]:
    """CURRENT-state commit list, checkpoint-accelerated: when a log
    checkpoint exists, return [synthetic checkpoint commit] + the tail
    commits after it — every state fold (_fold_live, _live_stats,
    _latest_schema, _table_check, txn watermarks, dv_rows) then costs
    O(tail), not O(history). The synthetic commit is shaped exactly
    like a real one so no fold changes; `txn_watermarks` carries the
    multi-app map (latest_txn_version understands it). HISTORICAL
    paths — time travel, version_as_of, history(), table_changes,
    vacuum's ever-added set, restore — keep reading the raw per-commit
    files, which are never deleted; the checkpoint is pure read
    acceleration, falling back to the full fold when absent or
    unreadable."""
    cv = _latest_checkpoint_version(path)
    if cv is None:
        return _read_commits(path, None)
    try:
        with open(
            os.path.join(path, _COMMITS, f"{cv:08d}.ckpt.json")
        ) as f:
            state = json.load(f)
    except (OSError, ValueError):
        return _read_commits(path, None)
    synthetic = {
        "version": int(state["version"]),
        "operation": "checkpoint",
        "added": state.get("live", []),
        "removed": [],
        "dv_added": state.get("live_dvs", []),
        "dv_removed": [],
    }
    for k in ("schema", "schema_json", "check", "cdf", "stats",
              "txn_watermarks", "committed_at", "column_map",
              "reserved_physical", "reader_features", "defaults",
              "exists_defaults", "generated"):
        if state.get(k):
            synthetic[k] = state[k]
    if state.get("live_dvs"):
        synthetic["dv_rows"] = int(state.get("dv_rows") or 0)
    # tail = only the commits AFTER the checkpoint — the whole point;
    # table_versions is a single listdir, no per-commit file reads
    tail = []
    for v in table_versions(path):
        if v > cv:
            with open(_commit_path(path, v)) as f:
                tail.append(json.load(f))
    return [synthetic] + tail


def checkpoint_log(path: str) -> int:
    """Write a LOG CHECKPOINT: the folded current state (live
    directories + their stats, live deletion vectors + row count,
    schema, CHECK constraint, per-app txn watermarks) lands in
    `_commits/%08d.ckpt.json`, and every subsequent snapshot resolve
    reads checkpoint + tail instead of the whole history — Delta's
    _last_checkpoint shape, the thing that keeps a table with years
    of commits driver-cheap (O(tail) instead of O(history) per
    operation). The per-commit JSONs are kept (provenance, time
    travel, DESCRIBE HISTORY, vacuum's ever-set all still read them);
    re-checkpointing after more commits supersedes by version. Write
    is tmp+rename atomic; a torn file is ignored by readers (full
    fold fallback). Returns the checkpointed version. Cadence is the
    caller's (Delta defaults to every 10 commits)."""
    commits = _read_commits(path, None)
    live = _fold_live(commits)
    dvs = _fold_live_dvs(commits)
    recorded: dict[str, dict] = {}
    for c in commits:
        for rel, st in c.get("stats", {}).items():
            recorded[rel] = st
    watermarks: dict[str, int] = {}
    for c in commits:
        t = c.get("txn")
        if t and t.get("app") is not None:
            v = int(t["version"])
            if watermarks.get(t["app"], v - 1) < v:
                watermarks[t["app"]] = v
    state = {
        "version": commits[-1]["version"],
        "live": live,
        "live_dvs": dvs,
        "dv_rows": sum(
            int(c.get("dv_rows") or 0) for c in commits if c.get("dv_added")
        ),
        "stats": {d: recorded[d] for d in live if recorded.get(d)},
        "committed_at": commits[-1].get("committed_at"),
    }
    if _latest_schema(commits):
        state["schema"] = _latest_schema(commits)
    for c in reversed(commits):
        if c.get("schema_json"):
            state["schema_json"] = c["schema_json"]
            break
    if _table_check(commits):
        state["check"] = _table_check(commits)
    if _table_cdf(commits):
        state["cdf"] = True
    # empty map/reservation folds may be omitted: the synthetic commit
    # REPLACES all history at or before it, so "key absent" and
    # "folded to empty" read back identically
    if _column_map(commits):
        state["column_map"] = _column_map(commits)
    if _reserved_physical(commits):
        state["reserved_physical"] = _reserved_physical(commits)
    if _reader_features(commits):
        state["reader_features"] = sorted(_reader_features(commits))
    if _column_defaults(commits):
        state["defaults"] = _column_defaults(commits)
    if _exists_defaults(commits):
        state["exists_defaults"] = {
            k: [e, v] for k, (e, v) in _exists_defaults(commits).items()
        }
    if _generated_cols(commits):
        state["generated"] = _generated_cols(commits)
    if watermarks:
        state["txn_watermarks"] = watermarks
    final = os.path.join(
        path, _COMMITS, f"{state['version']:08d}.ckpt.json"
    )
    tmp = final + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(state, f, sort_keys=True)
        f.write("\n")
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, final)
    return state["version"]


def _fold_live(commits: list[dict]) -> list[str]:
    live: list[str] = []
    for c in commits:
        for r in c.get("removed", []):
            live.remove(r)
        live.extend(c.get("added", []))
    return live


def _live_dirs(path: str, upto: int | None) -> list[str]:
    return _fold_live(_read_commits(path, upto))


def _fold_live_dvs(commits: list[dict]) -> list[str]:
    """The live DELETION-VECTOR relpaths at the last commit: added by
    delete_where(deletion_vectors=True), delisted when a rewrite
    physically applies them (compact always does; see each writer's
    docstring for which vectors it reconciles)."""
    live: list[str] = []
    for c in commits:
        for r in c.get("dv_removed", []):
            live.remove(r)
        live.extend(c.get("dv_added", []))
    return live


def _with_position(df: DataFrame) -> DataFrame:
    """Attach each row's physical address — table-relative file path
    (`_f`) and in-file row index (`_r`) — from the parquet scan's
    _metadata struct. Generated columns, zero extra I/O."""
    from pyspark.sql import functions as F

    return df.withColumn(
        "_f", F.regexp_extract(F.col("_metadata.file_path"), _FILE_RE, 1)
    ).withColumn("_r", F.col("_metadata.row_index"))


def _dv_relation(spark: SparkSession, path: str, commits: list[dict]):
    """The union of live deletion-vector sidecars as (_dv_file,
    _dv_row), broadcast while the commits' recorded row counts stay
    under _DV_BROADCAST_ROWS."""
    from pyspark.sql import functions as F

    dvs = _fold_live_dvs(commits)
    dv = spark.read.parquet(
        *[os.path.join(path, d) for d in dvs]
    ).select("_dv_file", "_dv_row")
    known = [c.get("dv_rows") for c in commits if c.get("dv_added")]
    if all(n is not None for n in known) and sum(known) <= _DV_BROADCAST_ROWS:
        dv = F.broadcast(dv)
    return dv


def _read_live(
    spark: SparkSession,
    path: str,
    commits: list[dict],
    dirs: list[str],
    schema,
    keep_position: bool = False,
) -> DataFrame:
    """DV-aware read of specific live directories, SPLIT by whether a
    live deletion vector actually targets them: CLEAN directories scan
    with no join in their subtree at all (at 100 TB, after a targeted
    delete, that is almost the whole table — the read tax tracks the
    DIRTY data, not the table), DIRTY directories anti-join the
    vectors; one unionByName stitches the two. The dirty set comes
    from one tiny distinct-directories job over the vector sidecars
    (|live DV rows| in, |directories| out). With no live vectors this
    is exactly a plain partitioned scan.

    COLUMN MAPPING: data files carry PHYSICAL names, so the scan uses
    the physical struct and one final projection aliases back to the
    logical names — every caller (merge/delete/update/compact and
    read_table itself) therefore sees logical frames and user
    predicates/keys just work; with an empty map the projection is
    the identity and is skipped."""
    from pyspark.sql import functions as F

    cmap = _column_map(commits)
    ed = {
        c: (e, v) for c, (e, v) in _exists_defaults(commits).items()
        if schema is not None and c in {f.name for f in schema.fields}
    }

    def _logical(df: DataFrame) -> DataFrame:
        if cmap:
            keep = [c for c in ("_f", "_r", "_bf_ver")
                    if c in df.columns]
            df = df.select(
                *[F.col(cmap.get(f.name, f.name)).alias(f.name)
                  for f in schema.fields],
                *keep,
            )
        if ed:
            # ExistsDefault backfill: rows from directories written
            # BEFORE a defaulted column existed read the frozen
            # default instead of NULL; the directory version comes
            # from the file path — a pure projection, zero extra I/O
            types = {f.name: f.dataType for f in schema.fields}
            for c, (expr, ver) in ed.items():
                df = df.withColumn(
                    c,
                    F.when(
                        F.col(c).isNull() & (F.col("_bf_ver") < ver),
                        F.expr(expr).cast(types[c]),
                    ).otherwise(F.col(c)),
                )
            df = df.drop("_bf_ver")
        return df

    def _scan(ds: list[str]) -> DataFrame:
        df = _read_dirs(spark, path, ds, pschema)
        if ed:
            df = df.withColumn(
                "_bf_ver",
                F.regexp_extract(
                    F.col("_metadata.file_path"), r"data/v(\d{8})-", 1
                ).cast("long"),
            )
        return df

    _check_reader_features(commits)
    pschema = _physical_struct(schema, cmap)
    dvs = _fold_live_dvs(commits)
    if not dvs or not dirs:
        df = _scan(dirs)
        return _logical(_with_position(df) if keep_position else df)
    dv = _dv_relation(spark, path, commits)
    affected = {
        r[0]
        for r in dv.select(
            F.regexp_extract(
                "_dv_file", r"(data/v\d{8}-[0-9a-f]+(?:/_bucket=\d+)?)", 1
            ).alias("d")
        )
        .distinct()
        .collect()
    }
    dirty = [d for d in dirs if d in affected]
    clean = [d for d in dirs if d not in affected]
    parts: list[DataFrame] = []
    if dirty:
        tagged = _with_position(_scan(dirty))
        cond = (
            (tagged["_f"] == dv["_dv_file"])
            & (tagged["_r"] == dv["_dv_row"])
        )
        joined = tagged.join(dv, cond, "left_anti")
        if not keep_position:
            joined = joined.drop("_f", "_r")
        parts.append(joined)
    if clean:
        cdf = _scan(clean)
        parts.append(_with_position(cdf) if keep_position else cdf)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _logical(out)


def _latest_schema(commits: list[dict]) -> str | None:
    """The table schema AT the last commit in `commits` — the most
    recent entry that recorded one (create always does; schema-
    evolving appends re-record). Time travel passes a truncated
    commit list, so historical reads resolve the schema as of that
    version, not today's."""
    for c in reversed(commits):
        s = c.get("schema")
        if s:
            return s
    return None


def _table_check(commits: list[dict]) -> str | None:
    """The table's CHECK constraint expression — the LATEST commit
    carrying the key wins (key presence: drop_check_constraint
    records an explicit None), so constraints can be added and
    dropped after create (add_check_constraint) and time travel
    resolves the constraint as of its version. Pre-r12 tables carry
    the key only on the create commit; the fold finds it the same
    way."""
    for c in reversed(commits):
        if "check" in c:
            return c["check"]
    return None


def _table_cdf(commits: list[dict]) -> bool:
    """Whether the table records a Change Data Feed (create-time
    property; the synthetic checkpoint commit re-carries it)."""
    return bool(commits[0].get("cdf")) if commits else False


# reader features THIS module knows how to honor — the protocol-
# versioning gate (Delta's readerFeatures): a table whose log demands
# a feature outside this set must REFUSE to read, because ignoring it
# returns wrong data silently (e.g. a reader that doesn't understand
# deletion vectors would resurrect deleted rows)
_KNOWN_READER_FEATURES = frozenset(
    {"deletion_vectors", "column_mapping"}
)


def _reader_features(commits: list[dict]) -> set[str]:
    """Union of reader features any commit activated — conservative
    (restore/compact never retire a feature; a reader that understands
    it is still required to read history)."""
    out: set[str] = set()
    for c in commits:
        out.update(c.get("reader_features", []))
    return out


def _check_reader_features(commits: list[dict]) -> None:
    unknown = _reader_features(commits) - _KNOWN_READER_FEATURES
    if unknown:
        raise ValueError(
            f"table requires reader feature(s) {sorted(unknown)} this "
            "engine does not implement; refusing to read rather than "
            "return silently wrong data (protocol-versioning gate)"
        )


def _column_map(commits: list[dict]) -> dict[str, str]:
    """COLUMN MAPPING state: {logical name -> physical name} for the
    columns whose on-disk (parquet) name differs from their current
    logical name — Delta's column-mapping shape, what makes RENAME
    COLUMN a metadata-only commit. Identity entries are never stored;
    a missing key means logical == physical. The LATEST commit
    carrying the key wins (key presence, not truthiness: renaming a
    column back to its physical name legitimately empties the map),
    so time travel resolves the mapping as of its version and the
    checkpoint's synthetic commit re-carries it."""
    for c in reversed(commits):
        if "column_map" in c:
            return dict(c["column_map"])
    return {}


def _column_defaults(commits: list[dict]) -> dict[str, str]:
    """WRITE-TIME defaults (Delta's WriteDefault half of column
    DEFAULT semantics): {logical column -> SQL literal/expression
    text}. A writer whose batch OMITS a defaulted column gets it
    filled at write time — the producers-upgrade-at-their-own-pace
    contract behind additive schema evolution; rows written BEFORE
    the column existed read NULL (qup13's recorded-schema semantics)
    unless the evolution also passed backfill=True, which records
    the ExistsDefault half (r13, _exists_defaults: per-directory
    resolution from the version embedded in the directory NAME — no
    per-file metadata needed after all). Latest commit carrying the
    key wins; maps merge at each evolution."""
    for c in reversed(commits):
        if "defaults" in c:
            return dict(c["defaults"])
    return {}


def _generated_cols(commits: list[dict]) -> dict[str, str]:
    """GENERATED columns (Delta's GENERATED ALWAYS AS shape):
    {logical column -> SQL expression over the other columns},
    declared at create. Writers FILL a generated column the batch
    omits (producers need not know the derivation) and VALIDATE one
    the batch supplies — the equality conjunct rides the data
    write's existing CHECK Observation (`_table_gate`), zero extra
    passes — so the recorded invariant `c == expr` holds on every
    committed row. With the column in stats_cols, predicates on the
    GENERATED column data-skip like any other (the
    partition-by-derived-date idiom without physical partitioning).
    Latest commit carrying the key wins (create writes it; the
    checkpoint's synthetic commit re-carries it)."""
    for c in reversed(commits):
        if "generated" in c:
            return dict(c["generated"])
    return {}


def _fill_generated(df: DataFrame, commits: list[dict]) -> DataFrame:
    """Compute any generated column the batch omits, CAST to the
    recorded type; supplied columns pass through (the write gate
    validates them)."""
    from pyspark.sql import functions as F

    gen = _generated_cols(commits)
    if not gen:
        return df
    schema = _schema_struct(commits)
    types = {f.name: f.dataType for f in schema.fields} if schema else {}
    for c, expr_text in gen.items():
        if c not in df.columns:
            col = F.expr(expr_text)
            if c in types:
                col = col.cast(types[c])
            df = df.withColumn(c, col)
    return df


def _regen(df: DataFrame, commits: list[dict], set_exprs: dict) -> DataFrame:
    """Recompute generated columns an UPDATE did not explicitly SET —
    Delta's generated-column UPDATE semantics: a SET on a source
    column re-derives the dependents (rows whose sources did not
    change recompute to their existing value, a no-op); an explicit
    SET on the generated column itself wins and the write gate then
    validates it."""
    from pyspark.sql import functions as F

    gen = _generated_cols(commits)
    if not gen:
        return df
    schema = _schema_struct(commits)
    types = {f.name: f.dataType for f in schema.fields} if schema else {}
    for c, e in gen.items():
        if c in df.columns and c not in set_exprs:
            col = F.expr(e)
            if c in types:
                col = col.cast(types[c])
            df = df.withColumn(c, col)
    return df


def _table_gate(commits: list[dict]) -> str | None:
    """The full write-time row gate: the table CHECK (if any) AND one
    null-safe equality conjunct per generated column — everything a
    committed row must satisfy, evaluated as ONE Observation riding
    the data write."""
    parts = []
    check = _table_check(commits)
    if check:
        parts.append(f"({check})")
    for c, expr_text in _generated_cols(commits).items():
        parts.append(f"(`{c}` <=> ({expr_text}))")
    return " AND ".join(parts) if parts else None


def _exists_defaults(commits: list[dict]) -> dict[str, tuple[str, int]]:
    """READ-TIME default backfill state (Delta's ExistsDefault half,
    closing the gap _column_defaults documents): {logical column ->
    (SQL expression text, intro version)}. A row written BEFORE
    `intro version` reads the (frozen) default wherever the recorded
    schema would have served NULL — per-directory knowledge comes
    FREE from the directory name (`data/v%08d-…`), so the backfill
    is one pure projection on the scan, no per-file metadata and no
    extra I/O (_read_live). The map is cumulative, latest commit
    carrying the key wins (the _column_defaults pattern); rename
    re-keys it, drop removes, checkpoint re-carries, and compact
    MATERIALIZES the values (its rewrite reads through the
    backfill), after which the new directory's version exceeds every
    intro version and the projection is a no-op for it."""
    for c in reversed(commits):
        if "exists_defaults" in c:
            return {
                k: (v[0], int(v[1]))
                for k, v in c["exists_defaults"].items()
            }
    return {}


def _fill_defaults(df: DataFrame, commits: list[dict]) -> DataFrame:
    """Add any missing defaulted columns to a batch, CAST to the
    table's recorded type — after this the ordinary evolution gate
    sees a complete batch."""
    from pyspark.sql import functions as F

    defaults = _column_defaults(commits)
    if not defaults:
        return df
    types = {f.name: f.dataType for f in _schema_struct(commits).fields}
    for c, expr_text in defaults.items():
        if c not in df.columns and c in types:
            df = df.withColumn(c, F.expr(expr_text).cast(types[c]))
    return df


def _reserved_physical(commits: list[dict]) -> list[str]:
    """Physical column names DROPPED from the logical schema but still
    present in live data files (drop_column is metadata-only — the
    bytes stay until a compact rewrites them). Schema evolution must
    refuse to ADD a column with one of these names: the physical
    struct would otherwise bind the new logical column to the old
    files' STALE bytes instead of NULLs. compact() clears the list —
    it rewrites every live directory through the logical projection,
    so the dropped physicals are really gone."""
    for c in reversed(commits):
        if "reserved_physical" in c:
            return list(c["reserved_physical"])
    return []


def _physical_struct(schema, cmap: dict[str, str]):
    """The on-disk shape of the logical `schema`: field names mapped
    through the column map (types/nullability/metadata unchanged)."""
    from pyspark.sql.types import StructField, StructType

    if not cmap or schema is None:
        return schema
    return StructType([
        StructField(
            cmap.get(f.name, f.name), f.dataType, f.nullable, f.metadata
        )
        for f in schema.fields
    ])


def _stats_cols_logical(live_stats: dict, cmap: dict[str, str]) -> list[str]:
    """LOGICAL names of every column the live directories carry stats
    for. Recorded stats are keyed by PHYSICAL names; callers that
    default their stats_cols from them must map BACK through the
    inverse of the column map before handing the set to _write_data
    (which translates logical->physical) — passing a physical name
    through the LOGICAL map can shadow another column after chained
    renames and silently drop its stats (r12 review finding)."""
    inv = {p: l for l, p in cmap.items()}
    return sorted(
        {inv.get(c, c) for st in live_stats.values() for c in st}
    )


def _bloom_cols_logical(live_stats: dict, cmap: dict[str, str]) -> list[str]:
    """LOGICAL names of every column some live directory carries a
    bloom filter for — the inheritance rule rewrites use so a merge
    or compact does not silently erode point-prunability (the same
    preserve-on-rewrite discipline the r11 advisory established for
    range stats)."""
    inv = {p: l for l, p in cmap.items()}
    return sorted({
        inv.get(c, c)
        for st in live_stats.values()
        for c, v in st.items()
        if isinstance(v, dict) and "bloom" in v
    })


def _bloom_prune(
    batch_df: DataFrame,
    key_cols: list[str],
    touched: list[str],
    live_stats: dict,
    cmap: dict[str, str],
    max_dirs: int = 64,
) -> tuple[list[str], list[str]]:
    """POINT-LOOKUP pruning (r13): among range-stats-surviving
    `touched` directories, probe each directory's per-key-column
    bloom filters with the batch's keys in ONE batch-sized
    aggregation (max of the per-row all-columns-hit flag per
    directory — no distinct, no shuffle beyond the agg) and drop the
    directories NO batch key can live in. Sound because blooms have
    no false negatives: a directory containing a batch key always
    hits. False positives only cost the scan the range stats would
    have paid anyway. Returns (still_touched, newly_pruned).
    Directories lacking a bloom on any key column stay touched;
    above `max_dirs` candidates the phase is skipped outright (the
    probe expression carries a 64-long literal array per
    directory-column — bounded plan size beats marginal pruning;
    at that directory count range stats or clustering are the right
    lever first)."""
    from pyspark.sql import functions as F

    from sora_spark.operators import sketch

    cand = []
    for d in touched:
        st = live_stats.get(d) or {}
        if all(
            isinstance(st.get(cmap.get(k, k)), dict)
            and "bloom" in st[cmap.get(k, k)]
            for k in key_cols
        ):
            cand.append(d)
    if not cand or len(cand) > max_dirs:
        return touched, []
    aggs = []
    for i, d in enumerate(cand):
        hit = F.lit(True)
        for k in key_cols:
            words = live_stats[d][cmap.get(k, k)]["bloom"]
            hit = hit & sketch.bloom_probe_col(k, [int(w) for w in words])
        aggs.append(F.max(hit.cast("int")).alias(f"h{i}"))
    # NULL guard, riding the same agg: a batch NULL key matches only
    # dir NULLs (merge's null-groups-with-null semantics) and blooms
    # never store NULLs — so when the batch carries a NULL in some
    # key column, a directory that MAY hold NULLs there (recorded
    # nulls > 0, or unknown) must stay touched despite a bloom miss
    aggs += [
        F.max(F.col(k).isNull().cast("int")).alias(f"_n{j}")
        for j, k in enumerate(key_cols)
    ]
    row = batch_df.agg(*aggs).collect()[0]
    null_cols = {
        key_cols[j] for j in range(len(key_cols)) if row[f"_n{j}"]
    }

    def _may_match_null(d: str) -> bool:
        st = live_stats[d]
        return any(
            st.get(cmap.get(k, k), {}).get("nulls", 1) > 0
            for k in null_cols
        )

    miss = {
        cand[i]
        for i in range(len(cand))
        if not row[f"h{i}"]
        and not (null_cols and _may_match_null(cand[i]))
    }
    if not miss:
        return touched, []
    return [d for d in touched if d not in miss], sorted(miss)


def _to_physical(df: DataFrame, cmap: dict[str, str]) -> DataFrame:
    """Project a LOGICAL frame to its PHYSICAL column names for
    writing — physical names are fixed at each column's introduction
    (create or evolution add), so every data directory of the table
    shares one physical schema forever and reads stay a single scan
    no matter how many renames happened (the Delta column-mapping
    invariant)."""
    from pyspark.sql import functions as F

    if not cmap:
        return df
    return df.select(
        *[F.col(c).alias(cmap.get(c, c)) for c in df.columns]
    )


def _write_cdc(changes: DataFrame, path: str, version: int) -> str:
    """Materialize one commit's row-level changes (table columns +
    `_change_type`) into a cdc/ sidecar; returns the relpath the
    commit should list under 'cdc'. Sized by the CHANGED rows."""
    rel = os.path.join(_CDC, f"v{version:08d}-{uuid.uuid4().hex[:12]}")
    changes.write.mode("error").parquet(os.path.join(path, rel))
    return rel


def _emit_change_pairs(j: DataFrame, cols: list[str], same) -> DataFrame:
    """Row-level change emission from a prefixed (_a_/_b_, _in_a/_in_b)
    full-outer diff join: inserts carry b's image, deletes a's, and an
    updated key explodes to the Delta-complete 'update_preimage' +
    'update_postimage' PAIR. ONE shared implementation for the CDF
    writer (_diff_frames) and snapshot CDC (table_changes
    include_preimages) so the pair encoding can never diverge between
    the persisted feed and the on-demand diff (r12 review finding)."""
    from pyspark.sql import functions as F

    pre = F.struct(*[F.col(f"_a_{c}").alias(c) for c in cols])
    post = F.struct(*[F.col(f"_b_{c}").alias(c) for c in cols])

    def entry(ct, img):
        return F.struct(F.lit(ct).alias("_ct"), img.alias("img"))

    pair = F.array(
        entry("update_preimage", pre), entry("update_postimage", post)
    )
    emit = (
        F.when(F.col("_in_a").isNull(), F.array(entry("insert", post)))
        .when(F.col("_in_b").isNull(), F.array(entry("delete", pre)))
        .when(same, F.slice(pair, 1, 0))  # typed empty array
        .otherwise(pair)
    )
    e = j.select(F.explode(emit).alias("e"))
    return e.select(
        *[F.col(f"e.img.{c}").alias(c) for c in cols],
        F.col("e._ct").alias("_change_type"),
    )


def _diff_frames(
    a: DataFrame, b: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Row-level diff a -> b on key columns (both key-unique, same
    schema): (table columns + _change_type), one null-safe full-outer
    join like table_changes but over in-flight frames instead of
    committed versions — the CDF writer's core. Inserts carry b's
    image, deletes a's, and an updated key emits the Delta-complete
    PAIR: 'update_preimage' (a's row) + 'update_postimage' (b's) —
    without the pre-image a downstream incremental consumer (MV
    maintenance, replication) cannot retract the old contribution.
    One pass: each joined row explodes to 0-2 typed entries."""
    import functools
    import operator

    from pyspark.sql import functions as F

    cols = b.columns
    nonkey = [c for c in cols if c not in key_cols]
    A = a.select(
        *[F.col(c).alias(f"_a_{c}") for c in cols], F.lit(1).alias("_in_a")
    )
    B = b.select(
        *[F.col(c).alias(f"_b_{c}") for c in cols], F.lit(1).alias("_in_b")
    )
    on = functools.reduce(
        operator.and_,
        [F.col(f"_a_{k}").eqNullSafe(F.col(f"_b_{k}")) for k in key_cols],
    )
    j = A.join(B, on, "full_outer")
    same = (
        F.struct(*[F.col(f"_a_{c}") for c in nonkey]).eqNullSafe(
            F.struct(*[F.col(f"_b_{c}") for c in nonkey])
        )
        if nonkey
        else F.lit(True)
    )
    return _emit_change_pairs(j, cols, same)


def _schema_struct(commits: list[dict]):
    """StructType of the table as of the last commit, or None. Prefers
    the lossless JSON form (schema_json, parsed sessionlessly via
    fromJson — survives column names simpleString cannot round-trip,
    the r11 review finding); falls back to parsing the simpleString
    DDL for pre-json commits."""
    from pyspark.sql.types import StructType

    for c in reversed(commits):
        if c.get("schema_json"):
            return StructType.fromJson(json.loads(c["schema_json"]))
        if c.get("schema"):
            return StructType.fromDDL(c["schema"])
    return None


def _stat_scalar(v):
    """JSON-safe, ORDER-PRESERVING encoding of a min/max value, or
    None when the type has no such encoding (then the column is
    omitted from stats and never prunes — conservative). ISO date /
    timestamp strings sort like the values they encode; Decimal does
    NOT sort lexicographically as a string, so it is excluded."""
    import datetime

    if isinstance(v, bool):
        return None
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (int, float, str)):
        return v
    return None


def _stat_agg_exprs(cols: list[str]) -> list:
    """The per-column (min, max, null-count) aggregate triple — the
    ONE encoding of directory stats, shared by _column_stats,
    _bucket_stats, and the Observation riding _write_data (r13
    review: three inline copies could drift)."""
    from pyspark.sql import functions as F

    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.min(c).alias(f"mn{i}"),
            F.max(c).alias(f"mx{i}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nu{i}"),
        ]
    return aggs


def _decode_stat(row, i: int) -> dict | None:
    """Decode one column's triple from an aggregate row: all-null
    columns carry {'nulls': n, 'allnull': True}; unprunable types
    (no order-preserving scalar encoding) return None and are
    omitted entirely — distinct from all-null, so _disjoint_on can
    still prune against an all-null side."""
    nulls = int(row[f"nu{i}"] or 0)
    lo, hi = _stat_scalar(row[f"mn{i}"]), _stat_scalar(row[f"mx{i}"])
    if row[f"mn{i}"] is None:
        return {"nulls": nulls, "allnull": True}
    if lo is not None and hi is not None:
        return {"min": lo, "max": hi, "nulls": nulls}
    return None


def _column_stats(df: DataFrame, cols: list[str]) -> dict:
    """One column-pruned pass: {col: {min, max, nulls}} per prunable
    column (encoding rules in _decode_stat)."""
    cols = [c for c in cols if c in df.columns]
    if not cols:
        return {}
    row = df.agg(*_stat_agg_exprs(cols)).collect()[0]
    out = {}
    for i, c in enumerate(cols):
        st = _decode_stat(row, i)
        if st is not None:
            out[c] = st
    return out


def _bucket_stats(df: DataFrame, cols: list[str]) -> dict:
    """Per-_bucket column stats in ONE grouped aggregation:
    {bucket: {col: {min, max, nulls}}} with _decode_stat's exact
    encoding/omission rules."""
    cols = [c for c in cols if c in df.columns]
    if not cols:
        return {}
    out: dict = {}
    for row in df.groupBy("_bucket").agg(*_stat_agg_exprs(cols)).collect():
        st = {}
        for i, c in enumerate(cols):
            dec = _decode_stat(row, i)
            if dec is not None:
                st[c] = dec
        out[int(row["_bucket"])] = st
    return out


def _disjoint_on(a: dict | None, b: dict | None) -> bool:
    """True only when NO row behind stats `a` can share this key-column
    value with a row behind stats `b`. SQL/window equality semantics:
    null groups with null, so two sides that both contain nulls are
    never disjoint; an all-null side is disjoint from a null-free one."""
    if a is None or b is None:
        return False  # no stats on a side -> cannot prune
    if a.get("nulls", 0) > 0 and b.get("nulls", 0) > 0:
        return False  # null == null under groupBy/window semantics
    if a.get("allnull") or b.get("allnull"):
        return True  # only nulls on that side; other side has none
    try:
        return a["max"] < b["min"] or b["max"] < a["min"]
    except (KeyError, TypeError):
        return False  # missing/incomparable ranges -> conservative


def _read_dirs(
    spark: SparkSession, path: str, dirs: list[str], schema
) -> DataFrame:
    """Read specific data directories WITH the table's recorded schema
    (a StructType, from _schema_struct) applied — after a merge_schema
    evolution, pre-evolution files must surface NULLs in the added
    columns here exactly as read_table does, or rewrite paths
    (merge/delete/compact) would union-fail or silently re-commit the
    old shape."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*[os.path.join(path, d) for d in dirs])


def _write_data(
    df: DataFrame,
    path: str,
    version: int,
    stats_cols: list[str] | None = None,
    check: str | None = None,
    column_map: dict[str, str] | None = None,
    drop_if_empty: bool = False,
    bloom_cols: list[str] | None = None,
) -> tuple[str | None, dict]:
    """Write df to a fresh data directory. The CHECK violation count
    AND the per-column min/max/null stats all ride the write itself
    as ONE Observation — zero extra passes: before r13 the stats came
    from re-reading the just-written parquet, a second full pass over
    every written byte (at 100 TB, a doubled write path). On a CHECK
    violation the directory is left UNPUBLISHED (the caller never
    commits it) and ConstraintViolationError raises. SQL CHECK
    semantics: NULL passes, only FALSE violates.

    `column_map` projects the LOGICAL df to its PHYSICAL names for
    the write, so every directory of a renamed table keeps one
    on-disk schema. The CHECK expression and the stats aggregates
    bind BEFORE the projection — both reference LOGICAL names — and
    stats are recorded under PHYSICAL names (one keyspace across
    renames; pruning sites translate their lookups), exactly the
    pre-r13 encoding (_stat_scalar rules: all-null marker, unprunable
    types omitted).

    `drop_if_empty=True` rides a row count on the same Observation:
    a zero-row write is REMOVED and (None, {}) returned, saving the
    caller's separate isEmpty() pre-pass (one whole job per
    merge/delete on the hot path).

    `bloom_cols` (r13) additionally records a per-directory BLOOM
    FILTER (4096-bit/k=3, operators/sketch.bloom_bitmap — the
    portable construction) under each named column's stats entry:
    min/max ranges cannot prune POINT lookups on layouts whose key
    ranges overlap (the interleaved-ingest shape), but a bloom can —
    merge_upsert probes each candidate directory's filter with the
    batch's keys and skips directories no batch key can be in
    (no false negatives -> pruning is sound; false positives only
    cost an extra scan). Cost: one column-pruned read-back of the
    just-written directory per bloom column — opt-in, and the one
    place the r13 stats-ride-the-write rule is traded back
    (the bitmap needs a distinct-explode the Observation cannot
    express); documented as the price of point-prunable stats."""
    from pyspark.sql import functions as F
    from pyspark.sql import Observation

    rel = os.path.join(_DATA, f"v{version:08d}-{uuid.uuid4().hex[:12]}")
    full = os.path.join(path, rel)
    scols = [c for c in (stats_cols or []) if c in df.columns]
    # filter bloom cols against the LOGICAL frame here — below this
    # point df may be projected to physical names
    bcols = [c for c in (bloom_cols or []) if c in df.columns]
    exprs = []
    if check:
        exprs.append(
            F.sum(
                (~F.coalesce(F.expr(check), F.lit(True))).cast("long")
            ).alias("viol")
        )
    if drop_if_empty:
        exprs.append(F.count(F.lit(1)).alias("nrows"))
    exprs += _stat_agg_exprs(scols)
    obs = None
    if exprs:
        obs = Observation()
        df = df.observe(obs, *exprs)
    if column_map:
        df = _to_physical(df, column_map)
    df.write.mode("error").parquet(full)
    row = obs.get if obs is not None else {}
    if check:
        bad = int(row["viol"] or 0)
        if bad:
            raise ConstraintViolationError(
                f"{bad} row(s) violate the table CHECK ({check}); "
                "nothing was committed"
            )
    if drop_if_empty and int(row["nrows"] or 0) == 0:
        import shutil

        shutil.rmtree(full, ignore_errors=True)
        return None, {}
    pmap = column_map or {}
    stats = {}
    for i, c in enumerate(scols):
        st = _decode_stat(row, i)
        if st is not None:
            stats[pmap.get(c, c)] = st
    if bcols:
        from sora_spark.operators import sketch

        back = df.sparkSession.read.parquet(full)
        for c in bcols:
            pc = pmap.get(c, c)
            stats.setdefault(pc, {})["bloom"] = sketch.bloom_bitmap(
                back, pc)
    return rel, stats


def _live_stats(
    path: str,
    upto: int | None = None,
    commits: list[dict] | None = None,
) -> dict:
    """{relpath: stats} for the live directories at `upto` (stats as
    recorded by the commit that ADDED each directory; dirs committed
    without stats map to {}). Pass `commits` to reuse an
    already-read log instead of re-reading it."""
    if commits is None:
        commits = _read_commits(path, upto)
    recorded: dict[str, dict] = {}
    for c in commits:
        for rel, st in c.get("stats", {}).items():
            recorded[rel] = st
    return {d: recorded.get(d, {}) for d in _fold_live(commits)}


def _publish(path: str, entry: dict) -> int:
    """Atomically claim `entry['version']`: write the JSON fully under
    a temp name, then hard-link it to the final name — the link is
    atomic and raises if the version exists, so a loser never
    publishes a half-written or conflicting commit. Every entry is
    stamped with its publish wall-clock (`committed_at`) for
    timestamp-based time travel and DESCRIBE HISTORY."""
    import time

    entry.setdefault("committed_at", time.time())
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


def create_table(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    stats_cols: list[str] | None = None,
    check: str | None = None,
    change_data_feed: bool = False,
    bloom_cols: list[str] | None = None,
    gen_cols: dict[str, str] | None = None,
) -> int:
    """Version 1: initial rows. Fails if the table already has commits.
    `stats_cols` records per-directory min/max/null stats in the
    commit so later merges/deletes can data-skip this directory.
    `check` declares a CHECK constraint (a SQL boolean expression
    over the table's columns): EVERY writer — append, merge, txn —
    validates its batch against it as an Observation riding the data
    write (no extra pass) and refuses to commit violations with
    ConstraintViolationError. NULL passes, FALSE violates (SQL
    semantics).

    `change_data_feed=True` (create-time property, Delta's CDF):
    every DATA-CHANGING writer additionally materializes its
    row-level changes into a `cdc/` sidecar listed on the commit —
    merge emits insert/update rows, DELETE (both modes) emits delete
    rows, UPDATE emits post-image update rows — so a stream can read
    the table's CHANGES (option readChangeFeed) instead of refusing
    change commits. Appends need no sidecar (their added files ARE
    the inserts). Cost rides the operation: the diff reuses frames
    the writer already computed."""
    write_gate = check
    if gen_cols:
        from pyspark.sql import functions as F

        # fill omitted generated columns on the initial rows, then
        # gate every present one exactly like later writers; the
        # RECORDED check stays the user's own (gen conjuncts are
        # re-derived by _table_gate from the generated map)
        for c, expr_text in gen_cols.items():
            if c not in df.columns:
                df = df.withColumn(c, F.expr(expr_text))
        gen_gate = " AND ".join(
            f"(`{c}` <=> ({e}))" for c, e in gen_cols.items()
        )
        write_gate = f"({check}) AND {gen_gate}" if check else gen_gate
    rel, stats = _write_data(df, path, 1, stats_cols, check=write_gate,
                             bloom_cols=bloom_cols)
    entry = {"version": 1, "operation": "create", "added": [rel],
             "removed": [], "schema": df.schema.simpleString(),
             "schema_json": df.schema.json()}
    if gen_cols:
        entry["generated"] = dict(gen_cols)
    if check:
        entry["check"] = check
    if change_data_feed:
        entry["cdf"] = True
    if stats:
        entry["stats"] = {rel: stats}
    return _publish(path, entry)


def _evolution_gate(
    commits: list[dict], df: DataFrame, merge_schema: bool, op: str
) -> bool:
    """Shared schema gate for append/merge: returns True when the batch
    legally EVOLVES the table (adds columns under merge_schema=True),
    False when the schemas already match, and raises on any other
    drift. The old-field map comes from _schema_struct — the lossless
    schema_json-preferred reconstruction — not from re-parsing the
    simpleString DDL, which cannot round-trip some legal column names
    (r11 advisory)."""
    want = _latest_schema(commits)
    got = df.schema.simpleString()
    if not want or got == want:
        return False
    if not merge_schema:
        raise ValueError(
            f"{op} schema {got} != table schema {want} "
            "(pass merge_schema=True to add columns)"
        )
    old = {f.name: f.dataType for f in _schema_struct(commits).fields}
    new = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in old if c not in new]
    changed = [c for c, t in old.items() if c in new and new[c] != t]
    if missing or changed:
        raise ValueError(
            "merge_schema only ADDS columns: "
            + (f"batch drops {missing} " if missing else "")
            + (f"batch retypes {changed}" if changed else "")
        )
    # COLUMN MAPPING guard: an added column's physical name is its
    # logical name, so it must not collide with a physical name some
    # RENAMED column still occupies on disk, nor with one a dropped
    # column left behind in live files — the physical struct would
    # bind the new column to stale bytes instead of NULLs
    cmap = _column_map(commits)
    taken = set(cmap.values())
    reserved = set(_reserved_physical(commits))
    for c in new:
        if c in old:
            continue
        if c in taken:
            raise ValueError(
                f"{op}: cannot add column {c!r} — a renamed column "
                "still uses that physical name on disk; pick another "
                "name"
            )
        if c in reserved:
            raise ValueError(
                f"{op}: cannot add column {c!r} — a dropped column of "
                "that name is still present in live data files; run "
                "compact() first to rewrite them, then re-add"
            )
    return True


def _revalidate_dir(
    spark: SparkSession,
    path: str,
    rel: str,
    check: str | None,
    commits: list[dict],
) -> None:
    """Semantic conflict rule for rebasing appends (Delta's
    metadata-change detection, resolved by re-validation instead of a
    blanket refusal): a rebase claims the next version WITHOUT
    rewriting its already-written directory, so when a concurrent
    commit ADDED or CHANGED the table CHECK after this batch
    validated itself, the batch must be re-validated against the new
    expression — otherwise the append+ADD-CONSTRAINT race would
    silently commit rows the just-added constraint forbids (an
    unserializable schedule: no serial order produces it, because a
    serial append-after-constraint refuses at write time). One
    batch-sized early-exit scan; on violation the append refuses with
    ConstraintViolationError and the orphan directory is left for
    vacuum. A DROPPED constraint needs no scan (every row passes)."""
    if check is None:
        return
    import re

    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(path, rel))
    cmap = _column_map(commits)
    schema = _schema_struct(commits)
    have = set(df.columns)
    # a CHECK added concurrently may bind a column this batch's
    # directory does not carry (the batch predates a column
    # evolution): F.expr would raise AnalysisException mid-rebase —
    # detect it first with the module's conservative word-match and
    # refuse with a conflict error a caller can act on (r13 advice)
    missing = [
        f.name for f in schema.fields
        if cmap.get(f.name, f.name) not in have and re.search(
            rf"\b{re.escape(f.name)}\b", check, re.IGNORECASE
        )
    ]
    if missing:
        raise ConstraintViolationError(
            f"a concurrent commit added CHECK ({check}) referencing "
            f"column(s) {missing} this in-flight batch does not carry; "
            "nothing committed — re-run the append with the evolved "
            "schema (rebase re-validation cannot evaluate the "
            "constraint over the batch)"
        )
    if cmap:
        # files carry PHYSICAL names; the CHECK binds LOGICAL ones
        df = df.select(*[
            F.col(cmap.get(f.name, f.name)).alias(f.name)
            for f in schema.fields
            if cmap.get(f.name, f.name) in have
        ])
    bad = df.filter(~F.coalesce(F.expr(check), F.lit(True))).limit(1)
    if not bad.isEmpty():
        raise ConstraintViolationError(
            f"a concurrent commit added CHECK ({check}) while this "
            "append was in flight and the batch violates it; nothing "
            "committed (rebase re-validation — the Delta-style "
            "metadata conflict rule)"
        )


def append(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    stats_cols: list[str] | None = None,
    merge_schema: bool = False,
    optimize_write: int | None = None,
    auto_compact: int | None = None,
    defaults: dict[str, str] | None = None,
    backfill: bool = False,
    bloom_cols: list[str] | None = None,
) -> int:
    """Append-only commit: adds a data directory, removes nothing.

    `defaults={"col": "sql literal"}` (with merge_schema=True)
    declares WRITE-TIME defaults for the columns this evolution
    adds: from this commit on, a batch that OMITS a defaulted column
    gets it filled at write (cast to the recorded type) instead of
    refusing — old-shaped producers keep appending through an
    additive evolution (Delta's WriteDefault). By default,
    pre-evolution ROWS still read NULL; `backfill=True` additionally
    records the ExistsDefault half (r13 — the gap the r12 docs
    declared out of scope is now closed WITHOUT per-file metadata):
    rows written before this commit read the default instead of
    NULL, resolved per-directory from the version embedded in every
    data directory's name — one pure projection on the scan
    (_exists_defaults / _read_live), frozen at this evolution's
    expression like Delta's ExistsDefault, materialized physically
    by the next compact.

    THE SMALL-FILES LEVERS (Delta's optimizeWrite/autoCompact shapes;
    at 100 TB the failure mode is not data volume but file count —
    every scan pays per-file open cost and the driver pays per-file
    planning):
    - `optimize_write=N` bin-packs the BATCH before writing: one
      count pass over the batch (batch-sized, never the table) sizes
      `repartition(ceil(rows/N))`, so a 10k-partition upstream job
      appending 1k rows lands 1 file instead of 10k near-empty ones.
    - `auto_compact=K` triggers a post-commit compact() when the LIVE
      directory count reaches K — streaming/micro-batch appends then
      keep a bounded directory count without an external maintenance
      job. The compact is its own commit (time travel sees both, like
      Delta); it inherits stats columns so pruning survives.

    `merge_schema=True` permits SCHEMA EVOLUTION with Delta's
    mergeSchema contract: the batch may ADD new columns (old files
    read back with NULLs there — `read_table` applies the latest
    recorded schema, so no footer-merge pass is ever needed), but
    may not drop columns or change a shared column's type — those
    still refuse loudly. The evolved schema is re-recorded in this
    commit, so time travel before it keeps the old shape.

    CONCURRENCY: a lost version race REBASES IN PLACE (Delta's
    semantic conflict rule for blind appends — appends commute with
    every concurrent commit that keeps the schema legal): the
    already-written data directory is re-published under the next
    version, so contention never re-reads or re-writes the batch.
    The schema gate re-checks against each winner's log (a
    concurrent evolution can legitimately flip the verdict);
    ConcurrentWriteError surfaces only after the attempt cap."""
    commits = _read_state_commits(path)
    df = _fill_generated(_fill_defaults(df, commits), commits)
    evolved = _evolution_gate(commits, df, merge_schema, "append")
    if defaults:
        if not (merge_schema and evolved):
            raise ValueError(
                "defaults= declares write-defaults for an EVOLVING "
                "append (merge_schema=True adding those columns)"
            )
        missing = [c for c in defaults if c not in df.columns]
        if missing:
            raise ValueError(
                f"defaults name columns the batch does not add: "
                f"{missing}"
            )
    if backfill and not defaults:
        raise ValueError(
            "backfill=True records ExistsDefaults for an evolving "
            "append's defaults= columns; pass defaults= too"
        )
    version = commits[-1]["version"] + 1
    if auto_compact is not None and auto_compact < 2:
        # validate BEFORE the commit: raising after _publish would
        # make a durably-committed append look failed (r12 review)
        raise ValueError("auto_compact threshold must be >= 2 dirs")
    if optimize_write is not None:
        if optimize_write < 1:
            raise ValueError("optimize_write must be >= 1 rows/file")
        import math

        n = df.count()
        df = df.repartition(max(1, math.ceil(n / optimize_write)))
    check_seen = _table_gate(commits)
    if bloom_cols is None:
        # inherit: dirs this table already blooms keep point-pruning
        bloom_cols = _bloom_cols_logical(
            _live_stats(path, commits=commits), _column_map(commits))
    rel, stats = _write_data(
        df, path, version, stats_cols, check=check_seen,
        column_map=_column_map(commits), bloom_cols=bloom_cols)
    last: ConcurrentWriteError | None = None
    for _ in range(8):
        entry = {"version": version, "operation": "append",
                 "added": [rel], "removed": []}
        if evolved:
            entry["schema"] = df.schema.simpleString()
            entry["schema_json"] = df.schema.json()
            entry["schema_evolved"] = True
            if defaults:
                entry["defaults"] = {
                    **_column_defaults(commits), **defaults
                }
                if backfill:
                    entry["exists_defaults"] = {
                        **{k: [e, v] for k, (e, v)
                           in _exists_defaults(commits).items()},
                        **{c: [defaults[c], version] for c in defaults},
                    }
        if stats:
            entry["stats"] = {rel: stats}
        try:
            v = _publish(path, entry)
            if auto_compact is not None:
                _maybe_auto_compact(spark, path, auto_compact)
            return v
        except ConcurrentWriteError as e:
            # rebase: someone else took this version — the data dir is
            # already on disk; re-gate the schema against the winner's
            # log and re-claim the next version (no data I/O unless
            # the CHECK changed, below)
            last = e
            commits = _read_state_commits(path)
            evolved = _evolution_gate(commits, df, merge_schema, "append")
            new_check = _table_gate(commits)
            if new_check != check_seen:
                # the winner changed the table CHECK: re-validate the
                # already-written batch before re-claiming (refuses on
                # violation — the unserializable schedule is rejected,
                # never silently merged)
                _revalidate_dir(spark, path, rel, new_check, commits)
                check_seen = new_check
            version = commits[-1]["version"] + 1
            # RENAME the written directory to the re-claimed version:
            # the version embedded in a directory name is load-bearing
            # (ExistsDefault backfill keys on it) — without this, a
            # rebased backfill evolution records intro=version while
            # its own directory keeps the lower pre-rebase number, and
            # the batch's explicit NULLs would read the default
            # (r13 review finding). One atomic rename, no data I/O.
            new_rel = os.path.join(
                _DATA, f"v{version:08d}-" + rel.rsplit("-", 1)[1]
            )
            os.rename(os.path.join(path, rel),
                      os.path.join(path, new_rel))
            rel = new_rel
    raise last


def _maybe_auto_compact(
    spark: SparkSession, path: str, min_dirs: int
) -> int | None:
    """Post-commit auto-compact (Delta's autoCompact shape): fires
    only at `min_dirs` live DIRECTORIES — gated here, not inside
    compact(), whose own live-DV override would otherwise fire a
    full rewrite right after every DV delete regardless of the
    threshold (r12 review). Best-effort by contract: ANY failure is
    swallowed (the append already committed durably and must never
    look failed; the next append re-triggers). The compact is the
    full single-directory rewrite — right for the dimension/state
    tables micro-batch appends target; fact tables should run
    compact(target_partitions=live_bytes/128MB) on their own
    cadence instead of auto_compact."""
    try:
        commits = _read_state_commits(path)
        if len(_fold_live(commits)) < min_dirs:
            return None
        return compact(spark, path, min_dirs=min_dirs)
    except Exception:
        return None


def _mapping_entry(schema, cmap: dict) -> dict:
    """Shared shape of a column-mapping commit: metadata-only (no
    added/removed), re-records the logical schema, carries the full
    map (key-present even when empty — renaming back to the physical
    name legitimately empties it), and is flagged schema_evolved so
    the streaming source stops at it exactly like at an evolution
    (the stream's declared schema is fixed at startingVersion)."""
    return {
        "operation": None,  # caller fills
        "added": [], "removed": [],
        "column_map": cmap,
        "schema": schema.simpleString(),
        "schema_json": schema.json(),
        "schema_evolved": True,
        "reader_features": ["column_mapping"],
    }


def rename_column(spark: SparkSession, path: str, old: str, new: str) -> int:
    """ALTER TABLE ... RENAME COLUMN, metadata-only (Delta's column
    mapping): publishes a commit that re-records the logical schema
    with the new name and maps it to the column's unchanged PHYSICAL
    name — zero data directories are read, written, or delisted, so
    the cost is one tiny JSON no matter the table size. Everything
    composes: reads project physical→logical (still one scan), time
    travel before the rename shows the old name, writers translate
    batches back to physical names (so stats pruning and the CHECK
    constraint — which binds create-time physical names — keep
    working), and RESTORE across a rename reverts the mapping.
    Streaming reads stop at the rename like at a schema evolution
    (restart with startingVersion past it to pick up the new name).

    A lost version race rebases in place (metadata-only commits
    commute with data commits; a concurrent schema change re-runs
    the validation and may legitimately refuse)."""
    import re

    last: ConcurrentWriteError | None = None
    for _ in range(8):
        commits = _read_state_commits(path)
        schema = _schema_struct(commits)
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(
                f"rename_column: no column {old!r} (table has {names})"
            )
        if new == old:
            raise ValueError("rename_column: old and new are the same")
        if new in names:
            raise ValueError(
                f"rename_column: column {new!r} already exists"
            )
        check = _table_check(commits)
        # case-insensitive (Spark resolves identifiers that way) and
        # deliberately conservative: a match inside a string literal
        # also refuses — a spurious refusal is recoverable (drop the
        # constraint, alter, re-add), a dangling reference blocks
        # every subsequent write
        if check and re.search(
            rf"\b{re.escape(old)}\b", check, re.IGNORECASE
        ):
            raise ValueError(
                f"rename_column: the table CHECK ({check}) references "
                f"{old!r}; drop the constraint, rename, then re-add it"
            )
        # same conservative word-match guard for GENERATED columns:
        # the column itself and any source its expression names are
        # both load-bearing identifiers in the recorded derivation
        gen = _generated_cols(commits)
        for gc, ge in gen.items():
            if old == gc or re.search(
                rf"\b{re.escape(old)}\b", ge, re.IGNORECASE
            ):
                raise ValueError(
                    f"rename_column: generated column {gc!r} "
                    f"(= {ge}) involves {old!r}; generated "
                    "derivations are fixed at create"
                )
        # same conservative word-match over DEFAULT / ExistsDefault
        # expression BODIES (r13 advice): re-keying the maps below
        # fixes the KEY, but an expression that references the renamed
        # column dangles — later _fill_defaults / backfill projections
        # would raise AnalysisException mid-scan or mid-write
        for dc, de in _column_defaults(commits).items():
            if re.search(rf"\b{re.escape(old)}\b", de, re.IGNORECASE):
                raise ValueError(
                    f"rename_column: the default for column {dc!r} "
                    f"(= {de}) references {old!r}; default expressions "
                    "are fixed at declaration — compact() and re-evolve "
                    "to change them"
                )
        for dc, (de, _iv) in _exists_defaults(commits).items():
            if re.search(rf"\b{re.escape(old)}\b", de, re.IGNORECASE):
                raise ValueError(
                    f"rename_column: the ExistsDefault for column "
                    f"{dc!r} (= {de}) references {old!r}; backfill "
                    "expressions are frozen at their evolution — "
                    "compact() to materialize them first"
                )
        cmap = _column_map(commits)
        phys = cmap.pop(old, old)
        if new != phys:
            cmap[new] = phys
        from pyspark.sql.types import StructField, StructType

        renamed = StructType([
            StructField(new if f.name == old else f.name,
                        f.dataType, f.nullable, f.metadata)
            for f in schema.fields
        ])
        entry = _mapping_entry(renamed, cmap)
        entry["operation"] = "rename_column"
        entry["renamed"] = {"from": old, "to": new}
        dfl = _column_defaults(commits)
        if old in dfl:
            dfl[new] = dfl.pop(old)
            entry["defaults"] = dfl
        edl = {k: [e, v] for k, (e, v) in _exists_defaults(commits).items()}
        if old in edl:
            edl[new] = edl.pop(old)
            entry["exists_defaults"] = edl
        entry["version"] = commits[-1]["version"] + 1
        try:
            return _publish(path, entry)
        except ConcurrentWriteError as e:
            last = e
    raise last


def drop_column(spark: SparkSession, path: str, col: str) -> int:
    """ALTER TABLE ... DROP COLUMN, metadata-only (the other half of
    Delta's column mapping): the column leaves the logical schema in
    one tiny JSON commit — no data is rewritten; the bytes stay in
    the live files (invisible: reads project only mapped logical
    columns) until a compact() rewrites them. The column's PHYSICAL
    name is recorded as RESERVED so schema evolution cannot re-add a
    column that would bind to the stale bytes; compact clears the
    reservation. Refuses to drop the last column or a column the
    table CHECK constraint references (new writes would no longer
    carry it, so the constraint could never be evaluated)."""
    import re

    last: ConcurrentWriteError | None = None
    for _ in range(8):
        commits = _read_state_commits(path)
        schema = _schema_struct(commits)
        names = [f.name for f in schema.fields]
        if col not in names:
            raise ValueError(
                f"drop_column: no column {col!r} (table has {names})"
            )
        if len(names) == 1:
            raise ValueError("drop_column: cannot drop the only column")
        cmap = _column_map(commits)
        phys = cmap.pop(col, col)
        check = _table_check(commits)
        if check and re.search(
            rf"\b{re.escape(col)}\b", check, re.IGNORECASE
        ):
            raise ValueError(
                f"drop_column: the table CHECK ({check}) references "
                f"{col!r}; drop the constraint first"
            )
        gen = _generated_cols(commits)
        for gc, ge in gen.items():
            if col == gc or re.search(
                rf"\b{re.escape(col)}\b", ge, re.IGNORECASE
            ):
                raise ValueError(
                    f"drop_column: generated column {gc!r} (= {ge}) "
                    f"involves {col!r}; generated derivations are "
                    "fixed at create"
                )
        # the dropped column's OWN default entry is popped below, but
        # ANOTHER column's default/ExistsDefault expression that
        # references it would dangle — same conservative word-match
        # refusal as CHECK and generated expressions (r13 advice)
        for dc, de in _column_defaults(commits).items():
            if dc != col and re.search(
                rf"\b{re.escape(col)}\b", de, re.IGNORECASE
            ):
                raise ValueError(
                    f"drop_column: the default for column {dc!r} "
                    f"(= {de}) references {col!r}; default expressions "
                    "are fixed at declaration — compact() and re-evolve "
                    "to change them"
                )
        for dc, (de, _iv) in _exists_defaults(commits).items():
            if dc != col and re.search(
                rf"\b{re.escape(col)}\b", de, re.IGNORECASE
            ):
                raise ValueError(
                    f"drop_column: the ExistsDefault for column {dc!r} "
                    f"(= {de}) references {col!r}; backfill "
                    "expressions are frozen at their evolution — "
                    "compact() to materialize them first"
                )
        from pyspark.sql.types import StructType

        shrunk = StructType([f for f in schema.fields if f.name != col])
        entry = _mapping_entry(shrunk, cmap)
        entry["operation"] = "drop_column"
        entry["dropped"] = col
        dfl = _column_defaults(commits)
        if col in dfl:
            dfl.pop(col)
            entry["defaults"] = dfl
        edl = {k: [e, v] for k, (e, v) in _exists_defaults(commits).items()}
        if col in edl:
            edl.pop(col)
            entry["exists_defaults"] = edl
        entry["reserved_physical"] = sorted(
            set(_reserved_physical(commits)) | {phys}
        )
        entry["version"] = commits[-1]["version"] + 1
        try:
            return _publish(path, entry)
        except ConcurrentWriteError as e:
            last = e
    raise last


def add_check_constraint(spark: SparkSession, path: str, expr: str) -> int:
    """ALTER TABLE ... ADD CONSTRAINT CHECK (expr) after create
    (Delta's shape): EXISTING rows are validated first with one
    early-exit scan (the predicate pushes into the pruned parquet
    read; a single violating row refuses) — a constraint the data
    already breaks must never be recorded, or every subsequent
    rewrite would spuriously refuse. From this commit on, every
    writer validates its batch exactly like a create-time CHECK.
    Single-constraint model: drop the existing one first (documented
    trade — one expression slot, compose with AND). Constraints bind
    LOGICAL column names; rename/drop of a referenced column
    refuses."""
    from pyspark.sql import functions as F

    commits = _read_state_commits(path)
    if _table_check(commits) is not None:
        raise ValueError(
            f"table already has a CHECK ({_table_check(commits)}); "
            "drop_check_constraint first (single-constraint model — "
            "compose with AND)"
        )
    # validation runs INSIDE the rebase loop: a lost race means some
    # writer committed between our scan and our claim, and its rows
    # were validated against the still-absent constraint — they must
    # pass the new expression too, or the pair append+ADD CONSTRAINT
    # has no serial equivalent (a serial constraint-then-append would
    # have refused the batch). Re-scanning on each rebase keeps the
    # recorded invariant true by construction; the appending side
    # closes the mirror-image window with _revalidate_dir. Each scan
    # is the early-exit pushdown read — per-rebase cost is acceptable
    # for a metadata operation.
    last: ConcurrentWriteError | None = None
    for _ in range(8):
        if _table_check(commits) is not None:
            raise ValueError(
                f"table already has a CHECK "
                f"({_table_check(commits)}); drop_check_constraint "
                "first"
            )
        bad = (
            read_table(spark, path)
            .filter(~F.coalesce(F.expr(expr), F.lit(True)))
            .limit(1)
        )
        if not bad.isEmpty():
            raise ConstraintViolationError(
                f"existing rows violate ({expr}); constraint not added"
            )
        try:
            return _publish(path, {
                "version": commits[-1]["version"] + 1,
                "operation": "add_constraint",
                "added": [], "removed": [], "check": expr,
            })
        except ConcurrentWriteError as e:
            last = e
            commits = _read_state_commits(path)
    raise last


def drop_check_constraint(spark: SparkSession, path: str) -> int:
    """ALTER TABLE ... DROP CONSTRAINT: records an explicit
    check=None (key-present, so the fold stops at it); time travel
    before the drop still enforces on historical rewrites."""
    commits = _read_state_commits(path)
    last: ConcurrentWriteError | None = None
    for _ in range(8):
        if _table_check(commits) is None:
            raise ValueError("table has no CHECK constraint to drop")
        try:
            return _publish(path, {
                "version": commits[-1]["version"] + 1,
                "operation": "drop_constraint",
                "added": [], "removed": [], "check": None,
            })
        except ConcurrentWriteError as e:
            last = e
            commits = _read_state_commits(path)
    raise last


def version_as_of(path: str, timestamp: float) -> int:
    """The newest version committed AT OR BEFORE the unix timestamp —
    Delta's AS OF TIMESTAMP resolution. Raises if the table did not
    exist yet. Commits published before the committed_at stamp
    existed (pre-r11 tables) sort as 0 and therefore always
    qualify."""
    best = None
    for c in _read_commits(path, None):
        if float(c.get("committed_at", 0.0)) <= timestamp:
            v = int(c["version"])
            best = v if best is None or v > best else best
    if best is None:
        raise ValueError(
            f"table at {path} has no version committed at or before "
            f"timestamp {timestamp}"
        )
    return best


def history(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE HISTORY: one row per commit — version, operation,
    publish timestamp, add/remove/prune counts, schema-evolution
    flag, and the txn tag if any. Driver-side fold of the log
    (commit-count bounded) surfaced as a DataFrame so it joins and
    filters like any relation."""
    rows = [
        (
            int(c["version"]),
            c.get("operation"),
            float(c.get("committed_at", 0.0)),
            len(c.get("added", [])),
            len(c.get("removed", [])),
            int(c.get("pruned_dirs", 0)),
            bool(c.get("schema_evolved", False)),
            (c.get("txn") or {}).get("app"),
            (c.get("txn") or {}).get("version"),
        )
        for c in _read_commits(path, None)
    ]
    return spark.createDataFrame(
        rows,
        "version BIGINT, operation STRING, committed_at DOUBLE, "
        "n_added INT, n_removed INT, n_pruned INT, "
        "schema_evolved BOOLEAN, txn_app STRING, txn_version BIGINT",
    )


def describe_detail(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE DETAIL: one row summarizing the table's CURRENT state
    — version, live file/byte counts, live deletion vectors and their
    recorded rows, pending cdc sidecars, schema, CHECK constraint,
    CDF flag, clustering of the newest optimize, and log-checkpoint
    presence. Driver-side fold (checkpoint-accelerated) plus one
    os.stat pass over the live files — bounded by file count, no
    Spark job."""
    commits = _read_state_commits(path)
    live = _fold_live(commits)
    dvs = _fold_live_dvs(commits)
    n_files, n_bytes = 0, 0
    for rel in live:
        full = os.path.join(path, rel)
        for f in os.listdir(full) if os.path.isdir(full) else []:
            fp = os.path.join(full, f)
            if os.path.isfile(fp) and f.endswith(".parquet"):
                n_files += 1
                n_bytes += os.path.getsize(fp)
    # cdc inventory and clustering provenance are HISTORY facts the
    # checkpoint deliberately doesn't fold — read the raw commits
    raw = _read_commits(path, None)
    clustered, zorder = None, False
    for c in reversed(raw):
        if c.get("operation") == "optimize" and c.get("clustered_by"):
            clustered = ",".join(c["clustered_by"])
            zorder = bool(c.get("zorder"))
            break
        if c.get("operation") == "optimize":
            break
    n_cdc = sum(len(c.get("cdc", [])) for c in raw)
    cmap = _column_map(commits)
    row = (
        int(commits[-1]["version"]),
        len(live),
        n_files,
        n_bytes,
        len(dvs),
        sum(int(c.get("dv_rows") or 0) for c in commits
            if c.get("dv_added")),
        n_cdc,
        _latest_schema(commits),
        _table_check(commits),
        _table_cdf(commits),
        clustered,
        zorder,
        _latest_checkpoint_version(path),
        (",".join(f"{l}->{p}" for l, p in sorted(cmap.items()))
         if cmap else None),
        len(_reserved_physical(commits)),
        (",".join(sorted(_reader_features(commits)))
         if _reader_features(commits) else None),
    )
    return spark.createDataFrame(
        [row],
        "version BIGINT, n_live_dirs INT, n_files INT, size_bytes "
        "BIGINT, n_deletion_vectors INT, dv_rows BIGINT, n_cdc_dirs "
        "INT, schema STRING, check_constraint STRING, "
        "change_data_feed BOOLEAN, clustered_by STRING, zorder "
        "BOOLEAN, checkpoint_version BIGINT, column_mapping STRING, "
        "n_reserved_physical INT, reader_features STRING",
    )


def read_table(
    spark: SparkSession, path: str, version: int | None = None,
    timestamp: float | None = None,
) -> DataFrame:
    """Snapshot read: resolves the live directory list ONCE (here), so
    the returned DataFrame is pinned to this version even if commits
    land while it is still being consumed. `version=` time-travels.
    The read applies the schema RECORDED as of that version: after a
    merge_schema append, files written before the evolution come back
    with NULLs in the new columns (no mergeSchema footer pass), and
    time travel to pre-evolution versions keeps the old shape.
    `timestamp=` (unix seconds) time-travels to the newest version
    committed at or before that instant — Delta's AS OF TIMESTAMP."""
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version= or timestamp=, not both")
        version = version_as_of(path, timestamp)
    # current-version reads take the checkpoint-accelerated state
    # path; time travel reads the raw per-commit files (always kept)
    commits = (
        _read_state_commits(path) if version is None
        else _read_commits(path, version)
    )
    live = _fold_live(commits)
    schema = _schema_struct(commits)
    if not live:
        _check_reader_features(commits)
        if schema is not None:
            # a delete that matched every row leaves zero live dirs;
            # SQL/Delta semantics: the table is EMPTY, not unreadable
            return spark.createDataFrame([], schema)
        raise ValueError(f"table at {path} has no live data")
    return _read_live(spark, path, commits, live, schema)


def _rename_rebased_rels(path: str, entry: dict, new_version: int) -> None:
    """Re-home every relpath a rebasing data-change entry publishes
    (added data dirs, cdc and dv sidecars) into the re-claimed
    version's name — the version embedded in a directory name is
    load-bearing for ExistsDefault backfill (the append-rebase rule),
    and keeping sidecar names consistent with their entry keeps the
    layout auditable. One atomic rename per directory, no data I/O;
    stats keys follow their directory."""
    for key in ("added", "cdc", "dv_added"):
        rels = entry.get(key)
        if not rels:
            continue
        out = []
        for rel in rels:
            head, _, base = rel.rpartition("/")
            new_rel = f"{head}/v{new_version:08d}-" + base.split("-", 1)[1]
            os.rename(os.path.join(path, rel), os.path.join(path, new_rel))
            if rel in entry.get("stats", {}):
                entry["stats"][new_rel] = entry["stats"].pop(rel)
            out.append(new_rel)
        entry[key] = out


_METADATA_FOLDS = (
    ("schema", _latest_schema),
    ("CHECK constraint", _table_check),
    ("column mapping", _column_map),
    ("column defaults", _column_defaults),
    ("exists-defaults", _exists_defaults),
    ("generated columns", _generated_cols),
    ("reserved physical names", _reserved_physical),
)


def _publish_data_change(
    spark: SparkSession,
    path: str,
    entry: dict,
    commits_then: list[dict],
    read_dirs: list[str],
    conflict_rows=None,
    key_cols: list[str] | None = None,
    batch_key_stats: dict | None = None,
    attempts: int = 8,
) -> int:
    """Publish a DATA-CHANGING commit (merge/delete/update, both
    physical strategies) with Delta-style FILE-LEVEL conflict
    detection (r13 verdict item 3 — these writers previously resolved
    every lost race by a full re-read-and-rewrite retry through
    commit_with_retry). A lost version race re-reads the log and
    classifies each winner:

    - METADATA conflict (any fold in _METADATA_FOLDS differs between
      our snapshot and now — schema evolution, CHECK, mapping,
      defaults, generated, reservations): REFUSE. Our delta was
      computed and validated under the old metadata; only a full
      re-run can re-validate it.
    - READ-SET conflict (a winner REMOVED a directory we read —
      `read_dirs` — or delisted one we are delisting): REFUSE. Our
      pre-image is stale; rebasing would lose the winner's rewrite
      or double-apply ours (the lost-update schedules).
    - DELETION-VECTOR conflict (a winner added DVs): REFUSE — a
      vector kills rows at sub-directory granularity this check
      cannot bound, and our rewrite of a dirtied directory would
      resurrect them.
    - ADDED-ROWS overlap: a winner's new directories may hold rows
      our operation SHOULD have seen (keys a merge must dedup
      against; rows a delete/update predicate matches). Directories
      whose RECORDED key-column stats are range-disjoint from the
      batch's key ranges (`batch_key_stats`, physical-name lookup —
      the same _disjoint_on arithmetic merge pruning uses) are safe
      without I/O; the rest pay ONE bounded scan of just those
      directories through `conflict_rows` (a callable mapping the
      winners' rows to the rows that conflict — key semi-join for
      merges, the predicate for delete/update). Any surviving row:
      REFUSE (Delta's ConcurrentAppendException). Zero: the winner
      commutes with us.

    On refusal a descriptive ConcurrentWriteError surfaces — under
    commit_with_retry that triggers the pre-existing full re-run
    against the winner's state, so semantics are unchanged, just
    slower on true conflicts. When every winner commutes the entry
    REBASES IN PLACE: directories rename into the re-claimed
    version's namespace and the publish retries — the already-written
    delta (batch-sized) is never re-read or re-written, which at
    100 TB is the difference between a merge retry costing a batch
    rename and costing the touched-directory rewrite again. Scale
    posture: the checks are driver-side over the WINNERS' entries
    (backlog-bounded, never the table) plus at most one scan of the
    winners' added directories (delta-bounded)."""
    try:
        return _publish(path, entry)
    except ConcurrentWriteError:
        pass
    last_msg = "lost the version race"
    for _ in range(max(int(attempts), 1)):
        commits_now = _read_state_commits(path)
        base_v = int(commits_then[-1]["version"])
        winners = [c for c in commits_now if int(c["version"]) > base_v]
        for what, fold in _METADATA_FOLDS:
            if fold(commits_then) != fold(commits_now):
                raise ConcurrentWriteError(
                    f"{entry.get('operation')} at {path!r}: a "
                    f"concurrent commit changed the table {what} "
                    "while this change was in flight; the delta must "
                    "be recomputed against the new metadata (retry "
                    "re-runs it — commit_with_retry does this "
                    "automatically)"
                )
        ours = set(read_dirs) | set(entry.get("removed", []))
        cmap_now = _column_map(commits_now)
        scan_rels: list[str] = []
        for w in winners:
            clash = set(w.get("removed", [])) & ours
            if clash:
                raise ConcurrentWriteError(
                    f"{entry.get('operation')} at {path!r}: concurrent "
                    f"{w.get('operation')} (version {w['version']}) "
                    f"rewrote director{'ies' if len(clash) > 1 else 'y'} "
                    f"this change read ({sorted(clash)[:3]}...); the "
                    "pre-image is stale — retry re-runs the change"
                )
            if w.get("dv_added"):
                raise ConcurrentWriteError(
                    f"{entry.get('operation')} at {path!r}: concurrent "
                    f"{w.get('operation')} (version {w['version']}) "
                    "added deletion vectors; row liveness changed at "
                    "sub-directory granularity — retry re-runs the "
                    "change against the vectored snapshot"
                )
            for rel in w.get("added", []):
                st = (w.get("stats") or {}).get(rel)
                if (
                    key_cols and batch_key_stats and st
                    and any(
                        _disjoint_on(
                            st.get(cmap_now.get(k, k)),
                            batch_key_stats.get(k),
                        )
                        for k in key_cols
                    )
                ):
                    continue  # provably disjoint: no I/O needed
                scan_rels.append(rel)
        if scan_rels:
            if conflict_rows is None:
                raise ConcurrentWriteError(
                    f"{entry.get('operation')} at {path!r}: concurrent "
                    f"commit(s) added director{'ies' if len(scan_rels) > 1 else 'y'} "
                    "whose overlap with this change cannot be ruled "
                    "out; retry re-runs the change"
                )
            df = _read_live(
                spark, path, commits_now, scan_rels,
                _schema_struct(commits_now),
            )
            if not conflict_rows(df).limit(1).isEmpty():
                raise ConcurrentWriteError(
                    f"{entry.get('operation')} at {path!r}: a "
                    "concurrent commit added rows this change should "
                    "have seen (overlapping keys / matching "
                    "predicate); refusing the rebase — retry re-runs "
                    "the change over them (Delta's "
                    "ConcurrentAppendException rule)"
                )
        new_version = int(commits_now[-1]["version"]) + 1
        _rename_rebased_rels(path, entry, new_version)
        entry["version"] = new_version
        commits_then = commits_now
        try:
            return _publish(path, entry)
        except ConcurrentWriteError as e:
            last_msg = str(e)
    raise ConcurrentWriteError(
        f"{entry.get('operation')} at {path!r}: {attempts} rebase "
        f"attempts exhausted ({last_msg})"
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    prune: bool = True,
    merge_schema: bool = False,
    merge_on_read: bool = False,
) -> int:
    """MERGE with the qup1 semantics (latest `ts_col` per key, batch
    wins ties) as a commit: reads the current snapshot, writes the
    merged rows to a NEW data directory, and commits it while
    DELISTING the rewritten directories — old versions stay readable
    (time travel), and a concurrent commit between the snapshot read
    and the publish surfaces as ConcurrentWriteError instead of
    silently losing one writer's rows (the atomic-swap sink's
    failure mode).

    DATA SKIPPING (the 100 TB lever): with `prune=True`, a live
    directory whose recorded key-column stats are provably disjoint
    from the batch's key ranges is left LISTED and unread — only the
    overlapping directories union with the batch, get deduplicated,
    and are rewritten. Cost is then proportional to touched data.
    Directories without stats (or incomparable/null-entangled ranges)
    are conservatively rewritten, so pruning never changes which keys
    the merge can see for a key-unique table (see the module-level
    SEMANTIC NOTE for the overlapping-append caveat; `prune=False`
    restores the full-table dedup unconditionally).

    `merge_schema=True` composes MERGE with qup13's schema evolution
    (Delta's autoMerge): a batch that ADDS columns evolves the table
    schema in the SAME commit that merges it — untouched and
    pass-through rows read back with NULLs in the added columns, and
    time travel before this commit keeps the old shape. Drops/retypes
    still refuse loudly (the append gate, shared).

    Live DELETION VECTORS are reconciled on the touched-directory
    read, so a DV-deleted row can never resurrect by losing a merge
    tiebreak it should not have entered; vectors aimed at rewritten
    directories become inert (their target files leave the live set)
    and are physically retired at the next compact."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    commits = _read_state_commits(path)
    batch_df = _fill_generated(_fill_defaults(batch_df, commits), commits)
    # same gate as append: without it a type-drifting batch would
    # be COERCED by unionByName and committed as a silently
    # different table schema, wedging later appends against the
    # stale recorded one (r11 review finding)
    evolved = _evolution_gate(commits, batch_df, merge_schema,
                              "merge_upsert batch")
    version = commits[-1]["version"] + 1
    live = _fold_live(commits)
    live_stats = _live_stats(path, commits=commits)
    # the rewrite re-records stats for every column the live dirs
    # already carry them for, not just the merge keys — otherwise each
    # merge silently erodes pruning on non-key columns while
    # delete/compact preserve it (r11 advisory)
    stats_cols = sorted(
        set(key_cols)
        | set(_stats_cols_logical(live_stats, _column_map(commits)))
    )

    touched, untouched = list(live), []
    bstats = None
    # compute batch stats ONLY when some live dir can actually be
    # pruned — otherwise the pass over the batch is pure waste
    # (r11 review finding). Recorded stats are keyed by PHYSICAL
    # names; key_cols are logical — translate the lookup.
    cmap = _column_map(commits)
    if prune and any(live_stats.values()):
        bstats = _column_stats(batch_df, key_cols)
        touched, untouched = [], []
        for d in live:
            skip = any(
                _disjoint_on(
                    live_stats[d].get(cmap.get(k, k)), bstats.get(k)
                )
                for k in key_cols
            )
            (untouched if skip else touched).append(d)
        # bloom phase (r13): point-prune the range survivors on
        # layouts whose key ranges overlap — one batch-sized probe
        touched, bloom_pruned = _bloom_prune(
            batch_df, key_cols, touched, live_stats, cmap)
        untouched += bloom_pruned

    if merge_on_read:
        return _merge_on_read(
            spark, path, commits, batch_df, key_cols, ts_col,
            touched, len(untouched), version, stats_cols, cmap,
            evolved=evolved,
            bloom_cols=_bloom_cols_logical(live_stats, cmap),
            batch_key_stats=bstats,
        )

    new = batch_df.withColumn("_src", F.lit(1))
    if touched:
        cur = _read_live(
            spark, path, commits, touched, _schema_struct(commits)
        ).withColumn("_src", F.lit(0))
        # evolution: the current rows lack the batch's added columns —
        # allowMissingColumns fills them with NULLs (Delta autoMerge)
        unioned = cur.unionByName(new, allowMissingColumns=evolved)
    else:
        unioned = new  # pure insert: nothing overlaps, dedup batch only
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col("_src").desc()
    )
    merged = (
        unioned
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    rel, stats = _write_data(
        merged, path, version, stats_cols, check=_table_gate(commits),
        column_map=cmap,
        bloom_cols=_bloom_cols_logical(live_stats, cmap))
    entry = {"version": version, "operation": "merge_upsert",
             "added": [rel], "removed": touched,
             "pruned_dirs": len(untouched)}
    if _table_cdf(commits):
        # CDF: diff the pre-image (touched rows only — pruned dirs
        # pass through unchanged, so they contribute no change rows)
        # against the merged output; rides as one extra join job
        if touched:
            pre = cur.drop("_src")
            have = set(pre.columns)
            pre = pre.select(*[
                F.col(f.name) if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in merged.schema.fields
            ])
        else:
            pre = spark.createDataFrame([], merged.schema)
        entry["cdc"] = [
            _write_cdc(_diff_frames(pre, merged, key_cols), path, version)
        ]
    if evolved:
        entry["schema"] = merged.schema.simpleString()
        entry["schema_json"] = merged.schema.json()
        entry["schema_evolved"] = True
    if stats:
        entry["stats"] = {rel: stats}
    # file-level conflict rules (r14): a lost race rebases in place
    # when every winner is provably disjoint from this merge's keys
    # and read set; true conflicts refuse descriptively and the
    # commit_with_retry wrapper re-runs the whole merge as before
    bk_keys = batch_df.select(*key_cols).distinct()
    return _publish_data_change(
        spark, path, entry, commits, read_dirs=touched,
        conflict_rows=lambda df: df.join(
            F.broadcast(bk_keys), key_cols, "left_semi"),
        key_cols=key_cols, batch_key_stats=bstats,
    )


def delete_where(
    spark: SparkSession,
    path: str,
    condition,
    stats_cols: list[str] | None = None,
    deletion_vectors: bool = False,
) -> int | None:
    """DELETE FROM table WHERE condition, as a commit. One pushdown
    scan over `_metadata.file_path` finds the live directories that
    actually CONTAIN matching rows (driver result bounded by the live
    directory count, never row count); only those are rewritten with
    the survivors — untouched directories stay listed unread, so the
    rewrite cost tracks the matched data. Returns the new version, or
    None when nothing matched (no commit published). NULL-safe: rows
    where the condition is NULL are kept, like SQL DELETE.

    `deletion_vectors=True` (the Delta DV shape, r11 verdict item 1)
    touches ZERO data directories: the matched rows' (file, row_index)
    positions are written to a `dv/` sidecar whose size tracks the
    MATCHED rows, and the commit lists only it (`dv_added`). Reads
    reconcile live vectors with a position anti-join (broadcast while
    small — `_apply_dvs`); `compact` applies them physically and
    delists them. At 100 TB this turns a selective DELETE from a
    directory rewrite into a position scan + tiny write. Repeated
    DV deletes stack (each scans live rows only, so positions are
    never double-listed); both modes fold the already-live vectors
    first, so neither can resurrect or re-match a dead row.

    `stats_cols` defaults to every column any live directory already
    has stats for, so data-skipping survives the rewrite. (DV deletes
    leave directory stats untouched — ranges then over-approximate
    the surviving rows, which keeps pruning sound, just looser until
    a compact tightens them.)"""
    from pyspark.sql import functions as F
    from pyspark.sql import Observation

    cond = F.expr(condition) if isinstance(condition, str) else condition
    commits = _read_state_commits(path)
    version = commits[-1]["version"] + 1
    live = _fold_live(commits)
    live_stats = _live_stats(path, commits=commits)
    if stats_cols is None:
        stats_cols = _stats_cols_logical(live_stats, _column_map(commits))

    schema = _schema_struct(commits)
    full = _read_live(
        spark, path, commits, live, schema, keep_position=True
    )

    if deletion_vectors:
        # matched positions ride ONE filtered scan straight into the
        # sidecar write; the count rides it as an Observation
        obs = Observation()
        matched = (
            full.filter(cond)
            .select(
                F.col("_f").alias("_dv_file"),
                F.col("_r").alias("_dv_row"),
            )
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        rel = os.path.join(
            _DV, f"v{version:08d}-{uuid.uuid4().hex[:12]}"
        )
        matched.write.mode("error").parquet(os.path.join(path, rel))
        n = int(obs.get["n"] or 0)
        if n == 0:
            # nothing matched: the just-written empty sidecar is an
            # unpublished orphan (vacuum reclaims it); publish nothing
            import shutil

            shutil.rmtree(os.path.join(path, rel), ignore_errors=True)
            return None
        entry = {
            "version": version, "operation": "delete_dv",
            "added": [], "removed": [],
            "dv_added": [rel], "dv_rows": n,
            "pruned_dirs": len(live),
            "reader_features": ["deletion_vectors"],
        }
        if _table_cdf(commits):
            tcols = [c for c in full.columns if c not in ("_f", "_r")]
            entry["cdc"] = [_write_cdc(
                full.filter(cond).select(
                    *tcols, F.lit("delete").alias("_change_type")),
                path, version,
            )]
        # read set = every live dir (the position scan saw them all);
        # a lost race rebases over winners whose added rows the
        # predicate provably never matches (r14 file-level rules)
        return _publish_data_change(
            spark, path, entry, commits, read_dirs=live,
            conflict_rows=lambda df: df.filter(
                F.coalesce(cond, F.lit(False))),
        )

    hit = {
        r[0]
        for r in full.filter(cond)
        .select(
            F.regexp_extract(
                # _f is the table-relative FILE path (tagged by
                # _read_live); its directory prefix is the relpath —
                # clustered-compact dirs register their _bucket= hive
                # subdir as the relpath, so capture it when present
                F.col("_f"),
                r"(data/v\d{8}-[0-9a-f]+(?:/_bucket=\d+)?)",
                1,
            ).alias("d")
        )
        .distinct()
        .collect()
    }
    touched = [d for d in live if d in hit]
    if not touched:
        return None
    keep = _read_live(spark, path, commits, touched, schema).filter(
        ~F.coalesce(cond, F.lit(False)))
    added, entry_stats = [], {}
    rel, stats = _write_data(
        keep, path, version, stats_cols,
        column_map=_column_map(commits), drop_if_empty=True,
        bloom_cols=_bloom_cols_logical(live_stats, _column_map(commits)))
    if rel:
        added = [rel]
        if stats:
            entry_stats = {rel: stats}
    entry = {"version": version, "operation": "delete",
             "added": added, "removed": touched,
             "pruned_dirs": len(live) - len(touched)}
    if _table_cdf(commits):
        tcols = [c for c in full.columns if c not in ("_f", "_r")]
        entry["cdc"] = [_write_cdc(
            full.filter(cond).select(
                *tcols, F.lit("delete").alias("_change_type")),
            path, version,
        )]
    if entry_stats:
        entry["stats"] = entry_stats
    return _publish_data_change(
        spark, path, entry, commits, read_dirs=live,
        conflict_rows=lambda df: df.filter(
            F.coalesce(cond, F.lit(False))),
    )


def _merge_on_read(
    spark: SparkSession,
    path: str,
    commits: list[dict],
    batch_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    touched: list[str],
    n_pruned: int,
    version: int,
    stats_cols: list[str],
    cmap: dict[str, str],
    evolved: bool = False,
    bloom_cols: list[str] | None = None,
    batch_key_stats: dict | None = None,
) -> int:
    """MERGE-ON-READ (Iceberg's merge-on-read / Delta's DV MERGE —
    merge_upsert's merge_on_read=True): instead of rewriting the
    touched directories, the current rows the batch supersedes die
    via a DELETION-VECTOR sidecar (position list, sized by the
    MATCHED rows) and the batch's winning rows land as one appended
    directory — the commit touches ZERO existing data directories,
    so a 20k-row upsert into a 100 TB table costs the batch plus a
    position scan of the key-overlapping directories (stats pruning
    applies to the scan exactly as to the rewrite), deferring the
    physical reconciliation to the next compact. The read-time tax
    is the DV anti-join on the dirty directories only (_read_live's
    clean/dirty split). Winner semantics are the rewrite's: latest
    ts_col per key, batch wins ties; batch rows older than the
    current row are dropped. Assumes a key-unique table (the
    create+merge lifecycle guarantee; with duplicate current keys
    the rewrite dedups, this path keeps the newer duplicate).

    `evolved=True` (r12 verdict item 2 — replaces the refusal that
    previously lived here): the batch legally ADDS columns
    (merge_upsert's shared evolution gate already vetted it) and
    this commit re-records the evolved schema: losers die via the
    vector exactly as before (positions are shape-agnostic), winners
    land in the NEW shape as the appended directory, and every old
    directory keeps reading NULL in the added columns through
    _read_live's explicit-schema scan (qup13's recorded-schema
    semantics — no footer merge). Time travel before this commit
    keeps the old shape. Column order of the recorded schema matches
    the rewrite path's unionByName(allowMissingColumns=True): table
    columns first, then the batch's added columns in batch order."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    wb = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    b = (
        batch_df.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    schema = _schema_struct(commits)
    cur = _read_live(
        spark, path, commits, touched, schema, keep_position=True
    ) if touched else None
    dv_rel, n_dv = None, 0
    cur_wins = None
    losers = None
    if cur is not None:
        # the dedup window over the batch and the DV-aware touched-dir
        # scan each feed several actions below (DV write, emptiness
        # probe, data write, CDC) — materialize once, matched-rows /
        # batch-rows sized respectively (r12 review)
        b = b.localCheckpoint(eager=True)
        bk = b.select(*key_cols, F.col(ts_col).alias("_bts"))
        j = cur.join(F.broadcast(bk), key_cols, "inner").localCheckpoint(
            eager=True
        )
        # batch wins ties — the rewrite path's _src tiebreak
        losers = j.filter(F.col("_bts") >= F.col(ts_col))
        obs = Observation()
        dv = losers.select(
            F.col("_f").alias("_dv_file"), F.col("_r").alias("_dv_row")
        ).observe(obs, F.count(F.lit(1)).alias("n"))
        rel_try = os.path.join(
            _DV, f"v{version:08d}-{uuid.uuid4().hex[:12]}"
        )
        dv.write.mode("error").parquet(os.path.join(path, rel_try))
        n_dv = int(obs.get["n"] or 0)
        if n_dv:
            dv_rel = rel_try
        else:
            import shutil

            shutil.rmtree(os.path.join(path, rel_try), ignore_errors=True)
        cur_wins = (
            j.filter(F.col("_bts") < F.col(ts_col))
            .select(*key_cols).distinct()
        )
    ins = b
    if cur_wins is not None:
        ins = b.join(F.broadcast(cur_wins), key_cols, "left_anti")
    out_schema = schema
    if evolved:
        # evolved logical shape = table columns (table order) + the
        # batch's added columns (batch order) — byte-identical column
        # order to the rewrite path's unionByName, so both physical
        # strategies record the same schema for the same merge
        old_names = [f.name for f in schema.fields]
        ordered = old_names + [
            f.name for f in b.schema.fields
            if f.name not in set(old_names)
        ]
        ins = ins.select(*ordered)
        out_schema = ins.schema
    added, entry_stats = [], {}
    rel, stats = _write_data(
        ins, path, version, stats_cols,
        check=_table_gate(commits), column_map=cmap,
        drop_if_empty=True, bloom_cols=bloom_cols,
    )
    if rel:
        added = [rel]
        if stats:
            entry_stats = {rel: stats}
    entry = {
        "version": version, "operation": "merge_upsert",
        "merge_on_read": True,
        "added": added, "removed": [],
        "pruned_dirs": n_pruned,
    }
    if dv_rel:
        entry["dv_added"] = [dv_rel]
        entry["dv_rows"] = n_dv
        entry["reader_features"] = ["deletion_vectors"]
    if evolved:
        entry["schema"] = out_schema.simpleString()
        entry["schema_json"] = out_schema.json()
        entry["schema_evolved"] = True
    if entry_stats:
        entry["stats"] = entry_stats
    if _table_cdf(commits):
        # the rewrite merge's exact emission semantics, via the same
        # helper: keys only in the batch diff as inserts, superseded
        # keys as pre/post pairs, and VALUE-IDENTICAL replacements as
        # nothing — a replayed batch is a physical change (DV + new
        # file) but a logical no-op, and the feed reports logical
        # changes (r12 review: the hand-rolled version emitted
        # spurious pairs the rewrite path suppresses). Under
        # evolution the pre-images NULL-fill the added columns, the
        # rewrite path's exact projection.
        tcols = [f.name for f in out_schema.fields]
        post = ins.select(*tcols)
        if losers is not None:
            have = set(losers.columns)
            pre = losers.select(*[
                F.col(f.name) if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in out_schema.fields
            ])
        else:
            pre = spark.createDataFrame([], post.schema)
        entry["cdc"] = [_write_cdc(
            _diff_frames(pre, post, key_cols), path, version,
        )]
    # read set = the key-overlapping dirs whose positions feed the
    # vector; same file-level rebase rules as the rewrite path (r14)
    return _publish_data_change(
        spark, path, entry, commits, read_dirs=touched,
        conflict_rows=lambda df: df.join(
            F.broadcast(b.select(*key_cols).distinct()),
            key_cols, "left_semi"),
        key_cols=key_cols, batch_key_stats=batch_key_stats,
    )


def replace_where(
    spark: SparkSession,
    path: str,
    condition: str,
    batch_df: DataFrame,
    stats_cols: list[str] | None = None,
) -> int:
    """INSERT OVERWRITE ... WHERE — Delta's replaceWhere: atomically
    replace exactly the rows matching `condition` with `batch_df`, in
    ONE commit (the backfill/partition-overwrite idiom: recompute one
    day/segment and swap it in without touching the rest). The batch
    must itself satisfy the predicate — rows outside it REFUSE the
    whole commit (ConstraintViolationError, nothing published),
    because silently inserting out-of-scope rows while deleting only
    in-scope ones corrupts the very invariant the caller is relying
    on. NULL predicate rows count as non-matching (kept, and illegal
    in the batch), SQL semantics.

    Cost shape is DELETE's: one pushdown position scan finds the
    directories that CONTAIN matching rows; only those are rewritten
    (survivors), untouched directories stay listed unread, and the
    batch lands as its own directory — so replacing one day of a
    100 TB table costs that day's data, not the table. The table
    CHECK constraint still validates the batch; live deletion
    vectors are reconciled on the survivor read; CDF tables record
    delete images of the replaced rows and insert images of the
    batch in the same commit."""
    from pyspark.sql import functions as F

    if not isinstance(condition, str):
        raise ValueError("replace_where takes the predicate as SQL text")
    cond = F.expr(condition)
    commits = _read_state_commits(path)
    batch_df = _fill_generated(_fill_defaults(batch_df, commits), commits)
    _evolution_gate(commits, batch_df, False, "replace_where batch")
    version = commits[-1]["version"] + 1
    live = _fold_live(commits)
    live_stats = _live_stats(path, commits=commits)
    if stats_cols is None:
        stats_cols = _stats_cols_logical(live_stats, _column_map(commits))
    cmap = _column_map(commits)
    schema = _schema_struct(commits)
    full = _read_live(
        spark, path, commits, live, schema, keep_position=True
    )
    # the batch-scope gate rides the batch write itself: every row
    # must SATISFY the predicate (strictly — NULL is out of scope)
    scope = f"coalesce(({condition}), false)"
    check = _table_gate(commits)
    gate = f"({scope}) AND ({check})" if check else scope
    bcols = _bloom_cols_logical(live_stats, cmap)
    batch_rel, batch_stats = _write_data(
        batch_df, path, version, stats_cols, check=gate, column_map=cmap,
        bloom_cols=bcols,
    )
    hit = {
        r[0]
        for r in full.filter(cond)
        .select(
            F.regexp_extract(
                F.col("_f"),
                r"(data/v\d{8}-[0-9a-f]+(?:/_bucket=\d+)?)",
                1,
            ).alias("d")
        )
        .distinct()
        .collect()
    }
    touched = [d for d in live if d in hit]
    added, entry_stats = [batch_rel], {}
    if batch_stats:
        entry_stats[batch_rel] = batch_stats
    if touched:
        keep = _read_live(spark, path, commits, touched, schema).filter(
            ~F.coalesce(cond, F.lit(False)))
        rel, stats = _write_data(
            keep, path, version, stats_cols, column_map=cmap,
            drop_if_empty=True, bloom_cols=bcols)
        if rel:
            added.append(rel)
            if stats:
                entry_stats[rel] = stats
    entry = {"version": version, "operation": "replace_where",
             "added": added, "removed": touched,
             "pruned_dirs": len(live) - len(touched)}
    if _table_cdf(commits):
        tcols = [c for c in full.columns if c not in ("_f", "_r")]
        deletes = full.filter(cond).select(
            *tcols, F.lit("delete").alias("_change_type"))
        inserts = batch_df.select(
            *tcols, F.lit("insert").alias("_change_type"))
        entry["cdc"] = [_write_cdc(
            deletes.unionByName(inserts), path, version)]
    if entry_stats:
        entry["stats"] = entry_stats
    return _publish(path, entry)


def update_where(
    spark: SparkSession,
    path: str,
    condition,
    set_exprs: dict,
    stats_cols: list[str] | None = None,
    merge_on_read: bool = False,
) -> int | None:
    """UPDATE table SET col = expr, ... WHERE condition, as a commit.
    Same cost shape as the rewrite DELETE: one pushdown scan over the
    row positions finds the live directories that CONTAIN matching
    rows, and only those are rewritten — matched rows get `set_exprs`
    applied (values for unlisted columns pass through), unmatched
    rows in the same directory pass through verbatim, untouched
    directories stay listed unread. SQL UPDATE semantics: a NULL
    condition leaves the row unchanged. Returns the new version, or
    None when nothing matched (no commit published).

    `merge_on_read=True` (Delta's DV-based UPDATE — r12 verdict item
    1, the last writer to get a zero-rewrite variant): instead of
    rewriting the directories that contain matches, the matched rows'
    positions die via a DELETION-VECTOR sidecar and their UPDATED
    images land as ONE appended directory — the commit touches zero
    existing data directories, so a one-row UPDATE into a 100 TB
    table costs one position scan plus a one-row write, deferring
    physical reconciliation to the next compact (which applies the
    vectors and delists them). Read-time tax is the DV anti-join on
    the dirty directories only (_read_live's clean/dirty split).
    Semantics are EXACTLY the rewrite path's — same matched set, same
    cast-back assignments, same CDC pre/post pairs — just a different
    physical plan; qup29 pins the hash equality both DV-served and
    post-compact.

    `set_exprs` maps column name -> SQL expression string or Column;
    expressions may reference any table column (e.g. {"price":
    "price * 1.1"}). Updating may not change the table schema: each
    assignment is CAST back to the column's current type, so an
    expression whose value cannot cast refuses at write time rather
    than silently committing a drifted schema. Live deletion vectors
    are reconciled on every read here, so a DV-deleted row can
    neither match nor resurrect. `stats_cols` defaults like DELETE's
    (every column live directories already track). The table CHECK
    constraint validates the rewritten directory as usual."""
    from pyspark.sql import functions as F

    cond = F.expr(condition) if isinstance(condition, str) else condition
    commits = _read_state_commits(path)
    version = commits[-1]["version"] + 1
    live = _fold_live(commits)
    live_stats = _live_stats(path, commits=commits)
    if stats_cols is None:
        stats_cols = _stats_cols_logical(live_stats, _column_map(commits))

    schema = _schema_struct(commits)
    full = _read_live(
        spark, path, commits, live, schema, keep_position=True
    )
    bad = [c for c in set_exprs if c not in full.columns]
    if bad:
        raise ValueError(f"update_where sets unknown column(s) {bad}")

    if merge_on_read:
        return _update_on_read(
            spark, path, commits, full, cond, set_exprs, live,
            version, stats_cols,
            bloom_cols=_bloom_cols_logical(
                live_stats, _column_map(commits)),
        )
    hit = {
        r[0]
        for r in full.filter(cond)
        .select(
            F.regexp_extract(
                F.col("_f"),
                r"(data/v\d{8}-[0-9a-f]+(?:/_bucket=\d+)?)",
                1,
            ).alias("d")
        )
        .distinct()
        .collect()
    }
    touched = [d for d in live if d in hit]
    if not touched:
        return None
    cur = _read_live(spark, path, commits, touched, schema)
    types = {f.name: f.dataType for f in cur.schema.fields}
    matched = F.coalesce(cond, F.lit(False))  # NULL cond -> unchanged
    out_cols = []
    for c in cur.columns:
        if c in set_exprs:
            e = set_exprs[c]
            e = (F.expr(e) if isinstance(e, str) else e).cast(types[c])
            out_cols.append(F.when(matched, e).otherwise(F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    updated = _regen(cur.select(*out_cols), commits, set_exprs)
    rel, stats = _write_data(
        updated, path, version, stats_cols, check=_table_gate(commits),
        column_map=_column_map(commits),
        bloom_cols=_bloom_cols_logical(live_stats, _column_map(commits)))
    entry = {"version": version, "operation": "update",
             "added": [rel], "removed": touched,
             "pruned_dirs": len(live) - len(touched)}
    if _table_cdf(commits):
        # the Delta-complete UPDATE pair: pre-images are the matched
        # rows' ORIGINAL values, post-images the transformation
        # applied to exactly those rows — both change-sized
        hit_rows = cur.filter(matched)
        pre = hit_rows.select(
            "*", F.lit("update_preimage").alias("_change_type"))
        post = _regen(
            hit_rows.select(*out_cols), commits, set_exprs
        ).select(
            "*", F.lit("update_postimage").alias("_change_type"))
        entry["cdc"] = [_write_cdc(pre.unionByName(post), path, version)]
    if stats:
        entry["stats"] = {rel: stats}
    return _publish_data_change(
        spark, path, entry, commits, read_dirs=live,
        conflict_rows=lambda df: df.filter(
            F.coalesce(cond, F.lit(False))),
    )


def _update_on_read(
    spark: SparkSession,
    path: str,
    commits: list[dict],
    full: DataFrame,
    cond,
    set_exprs: dict,
    live: list[str],
    version: int,
    stats_cols: list[str],
    bloom_cols: list[str] | None = None,
) -> int | None:
    """DV-mode UPDATE (update_where's merge_on_read=True): the matched
    rows' positions go to a deletion-vector sidecar, their updated
    images land as one appended directory, and the commit removes
    NOTHING — the Delta DV-UPDATE shape (vector the old rows, append
    the new images, reconcile at compact). The matched scan feeds
    three consumers (the vector, the image write, the CDC pair), so
    it is materialized ONCE, matched-rows-sized."""
    from pyspark.sql import functions as F

    matched = F.coalesce(cond, F.lit(False))  # NULL cond -> unchanged
    hit_rows = full.filter(matched).localCheckpoint(eager=True)
    n_dv = hit_rows.count()
    if n_dv == 0:
        return None

    tcols = [c for c in full.columns if c not in ("_f", "_r")]
    types = {f.name: f.dataType for f in full.schema.fields}
    out_cols = []
    for c in tcols:
        if c in set_exprs:
            e = set_exprs[c]
            e = (F.expr(e) if isinstance(e, str) else e).cast(types[c])
            out_cols.append(e.alias(c))
        else:
            out_cols.append(F.col(c))
    updated = _regen(hit_rows.select(*out_cols), commits, set_exprs)

    dv_rel = os.path.join(_DV, f"v{version:08d}-{uuid.uuid4().hex[:12]}")
    hit_rows.select(
        F.col("_f").alias("_dv_file"), F.col("_r").alias("_dv_row")
    ).write.mode("error").parquet(os.path.join(path, dv_rel))
    rel, stats = _write_data(
        updated, path, version, stats_cols, check=_table_gate(commits),
        column_map=_column_map(commits), bloom_cols=bloom_cols)
    entry = {
        "version": version, "operation": "update",
        "merge_on_read": True,
        "added": [rel], "removed": [],
        "dv_added": [dv_rel], "dv_rows": n_dv,
        "pruned_dirs": len(live),
        "reader_features": ["deletion_vectors"],
    }
    if _table_cdf(commits):
        # identical emission to the rewrite path: change-sized
        # pre/post pairs from the same matched set
        pre = hit_rows.select(
            *tcols, F.lit("update_preimage").alias("_change_type"))
        post = updated.select(
            "*", F.lit("update_postimage").alias("_change_type"))
        entry["cdc"] = [_write_cdc(pre.unionByName(post), path, version)]
    if stats:
        entry["stats"] = {rel: stats}
    return _publish_data_change(
        spark, path, entry, commits, read_dirs=live,
        conflict_rows=lambda df: df.filter(
            F.coalesce(cond, F.lit(False))),
    )


def compact(
    spark: SparkSession,
    path: str,
    target_partitions: int = 1,
    min_dirs: int = 2,
    cluster_by: list[str] | None = None,
    zorder: bool = False,
) -> int | None:
    """OPTIMIZE: rewrite the live directories, as a commit — the data
    is logically unchanged, old versions stay time-travelable, and
    `vacuum` later reclaims the delisted small directories. A no-op
    (returns None) below `min_dirs` live directories. Pick
    `target_partitions` by size (e.g. live bytes / 128 MB) for fact
    tables; the default 1 is the dimension-table setting. Stats
    columns are inherited so data-skipping keeps working.

    CLUSTERED OPTIMIZE (`cluster_by=[cols]`, the liquid-clustering
    shape): instead of one directory, the table is range-partitioned
    on the cluster columns into `target_partitions` RANGE-DISJOINT
    directories, each committed with its own tight min/max stats —
    so subsequent merges and deletes keyed near those columns prune
    to a few directories no matter how the table was originally
    laid down. Uses repartitionByRange (sampled range boundaries —
    the distributed shape; boundaries affect layout only, never the
    data) and registers each range bucket as its own relpath inside
    one write (a _bucket=i hive subdir; the bucket column itself is
    not part of the table schema and disappears under read_table's
    explicit schema).

    Z-ORDERED OPTIMIZE (`zorder=True`, exactly two cluster columns —
    Delta's ZORDER BY): lexicographic range clustering gives tight
    per-directory ranges on the FIRST cluster column only (every
    directory spans the second's full range); the Z variant
    range-partitions on the Morton interleave of the two columns
    (operators/layout.py zvalue over width_bucket-normalized values —
    normalization affects layout only, never data), so every
    directory is a tight BOX in both dimensions and predicates on
    EITHER column prune. The structural contrast (second-column
    delete touches all lexicographic buckets but few Z buckets) is
    pinned in test_capabilities.py::test_commit_log_zorder_compact."""
    from pyspark.sql import functions as F

    commits = _read_state_commits(path)
    live = _fold_live(commits)
    # compact is where deletion vectors are PHYSICALLY applied: the
    # rewrite reads through them, so the output contains survivors
    # only, and the commit delists every live vector — after this the
    # read path's anti-join side is empty again
    live_dvs = _fold_live_dvs(commits)
    # min_dirs is the small-file heuristic for plain OPTIMIZE; an
    # explicit cluster_by re-layout request is never silently ignored
    # (r11 review finding: a single-directory interleaved table is
    # exactly the retrofit case), and neither is a table with live
    # deletion vectors — reconciling them is a reason to compact
    if len(live) < min_dirs and not cluster_by and not live_dvs:
        return None
    version = commits[-1]["version"] + 1
    live_stats = _live_stats(path, commits=commits)
    cmap = _column_map(commits)
    stats_cols = _stats_cols_logical(live_stats, cmap)
    schema = _schema_struct(commits)
    full = _read_live(spark, path, commits, live, schema)
    n_out = max(int(target_partitions), 1)
    # compact rewrites EVERY live directory through the logical
    # projection, so physical names reserved by drop_column are
    # really gone from the live files — clear the reservation (the
    # name becomes addable again by schema evolution)
    unreserve = bool(_reserved_physical(commits))

    if not cluster_by:
        rel, stats = _write_data(
            full.repartition(n_out), path, version, stats_cols,
            column_map=cmap,
            bloom_cols=_bloom_cols_logical(live_stats, cmap),
        )
        entry = {"version": version, "operation": "optimize",
                 "added": [rel], "removed": live,
                 "dv_removed": live_dvs}
        if unreserve:
            entry["reserved_physical"] = []
        if stats:
            entry["stats"] = {rel: stats}
        return _publish(path, entry)

    stats_cols = sorted(
        {cmap.get(c, c) for c in set(stats_cols) | set(cluster_by)}
    )
    if zorder:
        if len(cluster_by) < 2:
            raise ValueError(
                "zorder=True needs at least two cluster_by columns "
                f"(got {cluster_by})"
            )
        from sora_spark.operators.layout import zvalue_n

        # normalize each dimension to 0..255 via width_bucket over its
        # observed range (one stats pass; layout-only, never the data);
        # N dimensions interleave round-robin (zvalue_n — identical to
        # the original 2-column layout when N=2), so every directory
        # is a tight box in ALL cluster dimensions
        aggs = []
        for i, c in enumerate(cluster_by):
            aggs += [F.min(c).alias(f"lo{i}"), F.max(c).alias(f"hi{i}")]
        rng = full.agg(*aggs).collect()[0]
        def _norm(c, lo, hi):
            if lo is None or hi is None or lo == hi:
                return F.lit(0).cast("long")
            # width_bucket maps v==hi to bucket n+1 — clamp into the
            # 8-bit range the interleave expects (layout-only)
            return F.least(
                F.greatest(
                    F.width_bucket(
                        F.col(c).cast("double"), F.lit(float(lo)),
                        F.lit(float(hi)), F.lit(256),
                    ) - 1,
                    F.lit(0),
                ),
                F.lit(255),
            ).cast("long")
        staged = full
        zcols = []
        for i, c in enumerate(cluster_by):
            zc = f"_z{i}"
            zcols.append(zc)
            staged = staged.withColumn(
                zc, _norm(c, rng[f"lo{i}"], rng[f"hi{i}"]))
        staged = (
            staged.withColumn("_z", zvalue_n(zcols, bits=8))
            .repartitionByRange(n_out, "_z")
            .sortWithinPartitions("_z")
            .drop("_z", *zcols)
            .withColumn("_bucket", F.spark_partition_id())
        )
    else:
        staged = (
            full.repartitionByRange(n_out, *[F.col(c) for c in cluster_by])
            .withColumn("_bucket", F.spark_partition_id())
        )
    if cmap:
        # the staged pipeline computed over logical names; write
        # physical ones (keeping the layout-only _bucket column)
        staged = staged.select(
            *[F.col(f.name).alias(cmap.get(f.name, f.name))
              for f in schema.fields],
            F.col("_bucket"),
        )
    base_rel = os.path.join(
        _DATA, f"v{version:08d}-{uuid.uuid4().hex[:12]}"
    )
    staged.write.partitionBy("_bucket").mode("error").parquet(
        os.path.join(path, base_rel)
    )
    buckets = sorted(
        d for d in os.listdir(os.path.join(path, base_rel))
        if d.startswith("_bucket=")
    )
    # ONE grouped pass over the written data computes every bucket's
    # stats (the hive read exposes _bucket as a partition column) —
    # not a per-bucket driver loop of read jobs (r11 review finding)
    added, entry_stats = [], {}
    grouped = _bucket_stats(
        spark.read.parquet(os.path.join(path, base_rel)), stats_cols
    )
    for b in buckets:
        rel = os.path.join(base_rel, b)
        added.append(rel)
        st = grouped.get(int(b.split("=", 1)[1]), {})
        if st:
            entry_stats[rel] = st
    entry = {"version": version, "operation": "optimize",
             "added": added, "removed": live,
             "dv_removed": live_dvs,
             "clustered_by": list(cluster_by)}
    if unreserve:
        entry["reserved_physical"] = []
    if zorder:
        entry["zorder"] = True
    if entry_stats:
        entry["stats"] = entry_stats
    return _publish(path, entry)


def compact_small(
    spark: SparkSession,
    path: str,
    max_dir_bytes: int,
    target_partitions: int = 1,
    min_dirs: int = 2,
) -> int | None:
    """Size-SELECTIVE OPTIMIZE (r13 — closing the r12 watch item
    'auto-compact is full-table'): rewrite only the live directories
    whose data bytes are under `max_dir_bytes`, leaving the
    well-sized ones untouched and unread — the Delta OPTIMIZE
    file-selection semantics, and the fact-table maintenance shape:
    on a 100 TB table the cost tracks the SMALL files a micro-batch
    ingest leaves behind, never the compacted bulk. A no-op
    (returns None) below `min_dirs` qualifying directories. Sizes
    come from a driver-side listing (stat calls bounded by the live
    file count).

    Deletion vectors are handled surgically, not wholesale: the
    rewrite reads the selected directories THROUGH the live vectors
    (their positions are applied physically), and vectors aimed at
    UNSELECTED directories survive as one re-written residual
    sidecar — the commit delists every old vector and lists the
    residual, so no dead row revives and no unselected directory
    pays a rewrite. Unlike full compact, dropped-column physical
    names stay reserved (unselected directories may still hold the
    bytes). Stats columns are inherited; the merged directory gets
    fresh stats."""
    from pyspark.sql import functions as F

    commits = _read_state_commits(path)
    live = _fold_live(commits)
    cmap = _column_map(commits)
    live_stats = _live_stats(path, commits=commits)
    stats_cols = _stats_cols_logical(live_stats, cmap)
    schema = _schema_struct(commits)
    live_dvs = _fold_live_dvs(commits)

    def _dir_bytes(rel: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(os.path.join(path, rel)):
            for f in files:
                if not f.startswith(("_", ".")):
                    total += os.path.getsize(os.path.join(root, f))
        return total

    small = [d for d in live if _dir_bytes(d) < int(max_dir_bytes)]
    if len(small) < max(int(min_dirs), 2):
        return None
    version = commits[-1]["version"] + 1
    merged = _read_live(spark, path, commits, small, schema)
    rel, stats = _write_data(
        merged.repartition(max(int(target_partitions), 1)),
        path, version, stats_cols, column_map=cmap, drop_if_empty=True,
        bloom_cols=_bloom_cols_logical(live_stats, cmap),
    )
    entry = {
        "version": version, "operation": "optimize",
        "small_only": True, "max_dir_bytes": int(max_dir_bytes),
        "added": [rel] if rel else [], "removed": small,
        "pruned_dirs": len(live) - len(small),
    }
    if live_dvs:
        # vectors aimed at selected dirs were applied by the read;
        # the rest survive as one residual sidecar
        dv = spark.read.parquet(
            *[os.path.join(path, d) for d in live_dvs]
        ).select("_dv_file", "_dv_row")
        dircol = F.regexp_extract(
            "_dv_file", r"(data/v\d{8}-[0-9a-f]+(?:/_bucket=\d+)?)", 1
        )
        resid = dv.filter(~dircol.isin(small)).localCheckpoint(
            eager=True)
        n_resid = resid.count()
        entry["dv_removed"] = live_dvs
        if n_resid:
            dv_rel = os.path.join(
                _DV, f"v{version:08d}-{uuid.uuid4().hex[:12]}"
            )
            resid.write.mode("error").parquet(os.path.join(path, dv_rel))
            entry["dv_added"] = [dv_rel]
            entry["dv_rows"] = n_resid
            entry["reader_features"] = ["deletion_vectors"]
    if stats and rel:
        entry["stats"] = {rel: stats}
    return _publish(path, entry)


def restore_table(spark: SparkSession, path: str, version: int) -> int:
    """RESTORE TABLE ... TO VERSION — Delta's rollback: publish a NEW
    commit whose live file set (and live deletion vectors, and
    schema) equal those of `version`, leaving all history intact —
    the rollback is itself time-travelable and shows in DESCRIBE
    HISTORY, nothing is deleted. Pure log manipulation: no data is
    read or written, cost is the driver-side fold. Refuses if any
    directory the target version needs was already reclaimed by
    vacuum (Delta's restore has the same failure mode)."""
    commits_now = _read_commits(path, None)
    commits_then = _read_commits(path, version)
    live_now, live_then = _fold_live(commits_now), _fold_live(commits_then)
    dv_now = _fold_live_dvs(commits_now)
    dv_then = _fold_live_dvs(commits_then)
    missing = [
        d for d in live_then + dv_then
        if not os.path.isdir(os.path.join(path, d))
    ]
    if missing:
        raise ValueError(
            f"cannot restore to version {version}: {len(missing)} "
            f"directories were vacuumed (e.g. {missing[0]})"
        )
    new_version = commits_now[-1]["version"] + 1
    entry = {
        "version": new_version, "operation": "restore",
        "restored_version": int(version),
        "removed": [d for d in live_now if d not in set(live_then)],
        "added": [d for d in live_then if d not in set(live_now)],
        "dv_removed": [d for d in dv_now if d not in set(dv_then)],
        "dv_added": [d for d in dv_then if d not in set(dv_now)],
    }
    # re-record the target's schema so post-evolution rollbacks read
    # with the right shape; stats for re-added dirs are re-recorded
    # from what their original commits carried
    then_schema = _latest_schema(commits_then)
    now_schema = _latest_schema(commits_now)
    if then_schema and then_schema != now_schema:
        entry["schema"] = then_schema
        for c in reversed(commits_then):
            if c.get("schema_json"):
                entry["schema_json"] = c["schema_json"]
                break
        entry["schema_evolved"] = True
    # restore across a rename/drop reverts the COLUMN MAPPING too —
    # the schema string alone would leave reads projecting through
    # the newer map (key-present records override the fold)
    if _column_map(commits_then) != _column_map(commits_now):
        entry["column_map"] = _column_map(commits_then)
    if _reserved_physical(commits_then) != _reserved_physical(commits_now):
        entry["reserved_physical"] = _reserved_physical(commits_then)
    if _table_check(commits_then) != _table_check(commits_now):
        entry["check"] = _table_check(commits_then)
    # restore across a defaults-evolution reverts both default maps
    # (a later re-evolution must not inherit a rolled-back backfill)
    if _column_defaults(commits_then) != _column_defaults(commits_now):
        entry["defaults"] = _column_defaults(commits_then)
    if _exists_defaults(commits_then) != _exists_defaults(commits_now):
        entry["exists_defaults"] = {
            k: [e, v]
            for k, (e, v) in _exists_defaults(commits_then).items()
        }
    then_stats = _live_stats(path, commits=commits_then)
    readd_stats = {
        d: then_stats[d] for d in entry["added"] if then_stats.get(d)
    }
    if readd_stats:
        entry["stats"] = readd_stats
    # dv_rows for re-added vectors: inherit the recorded counts so the
    # broadcast decision stays informed
    readd_rows = 0
    for c in commits_then:
        for d in c.get("dv_added", []):
            if d in set(entry["dv_added"]):
                readd_rows += int(c.get("dv_rows") or 0)
    if entry["dv_added"]:
        entry["dv_rows"] = readd_rows
    return _publish(path, entry)


def clone_table(spark: SparkSession, src: str, dst: str) -> int:
    """SHALLOW-style CLONE: materialize the source's CURRENT snapshot
    as an independent table at `dst` without copying any data bytes —
    every live data file (and live deletion-vector file) is
    HARD-LINKED into the clone (POSIX link: zero-copy, refcounted, so
    either table may vacuum/rewrite independently afterwards; an
    object-store port would reference manifests instead, Delta's
    shallow-clone shape). The clone's single commit is published AT
    THE SOURCE'S latest version number (not 1): cloned directories
    keep their source relpaths, and the version embedded in a
    directory name is load-bearing for ExistsDefault backfill
    (_exists_defaults) — restarting the clone's numbering would give
    post-clone writes directory versions BELOW the inherited intro
    versions and backfill their genuine NULLs (r13 review finding).
    One version namespace, one invariant. The clone inherits schema,
    CHECK constraint, per-directory stats, default maps, and live
    DVs — reads of the clone are immediately identical to the source
    snapshot. Cost is metadata-only (one link per file), measured in
    scripts/table_probe.py."""
    commits = _read_state_commits(src)
    live, dvs = _fold_live(commits), _fold_live_dvs(commits)
    if os.path.isdir(os.path.join(dst, _COMMITS)):
        raise ValueError(f"clone target {dst!r} already has a commit log")
    live_stats = _live_stats(src, commits=commits)

    def _link_dir(rel: str) -> None:
        s_dir = os.path.join(src, rel)
        d_dir = os.path.join(dst, rel)
        os.makedirs(d_dir, exist_ok=True)
        for f in os.listdir(s_dir):
            sf = os.path.join(s_dir, f)
            if os.path.isfile(sf):
                os.link(sf, os.path.join(d_dir, f))

    for rel in live + dvs:
        _link_dir(rel)
    entry = {
        "version": commits[-1]["version"], "operation": "clone",
        "cloned_from": src,
        "cloned_version": commits[-1]["version"],
        "added": list(live), "removed": [],
    }
    if dvs:
        entry["dv_added"] = list(dvs)
        entry["dv_rows"] = sum(
            int(c.get("dv_rows") or 0) for c in commits if c.get("dv_added")
        )
    schema = _latest_schema(commits)
    if schema:
        entry["schema"] = schema
    for c in reversed(commits):
        if c.get("schema_json"):
            entry["schema_json"] = c["schema_json"]
            break
    check = _table_check(commits)
    if check:
        entry["check"] = check
    if _table_cdf(commits):
        entry["cdf"] = True  # the clone keeps recording change data
    if _column_map(commits):
        entry["column_map"] = _column_map(commits)
    if _reserved_physical(commits):
        entry["reserved_physical"] = _reserved_physical(commits)
    if _reader_features(commits):
        entry["reader_features"] = sorted(_reader_features(commits))
    if _column_defaults(commits):
        entry["defaults"] = _column_defaults(commits)
    if _exists_defaults(commits):
        # the cloned directories keep their source names (and so
        # their embedded versions) — the intro versions stay valid
        entry["exists_defaults"] = {
            k: [e, v] for k, (e, v) in _exists_defaults(commits).items()
        }
    if _generated_cols(commits):
        entry["generated"] = _generated_cols(commits)
    stats = {d: s for d, s in live_stats.items() if s}
    if stats:
        entry["stats"] = stats
    return _publish(dst, entry)


def table_changes(
    spark: SparkSession,
    path: str,
    v_from: int | None = None,
    v_to: int | None = None,
    key_cols: list[str] | None = None,
    include_preimages: bool = False,
    ts_from: float | None = None,
    ts_to: float | None = None,
) -> DataFrame:
    """Snapshot CDC: the row-level diff between two committed versions
    as a DataFrame with the table's columns plus `_change_type` in
    ('insert', 'update', 'delete'). Inserts/updates carry the v_to
    image, deletes the v_from image. Computed as ONE null-safe
    full-outer join on the key columns — no changelog is stored, so
    this works across ANY version pair (including spans that contain
    compactions, which diff to zero rows). Requires both snapshots to
    be key-unique, which create/merge/delete lifecycles guarantee;
    duplicate keys would multiply join matches.

    `include_preimages=True` switches updates to the Delta-complete
    PAIR — 'update_preimage' (v_from image) + 'update_postimage'
    (v_to image) — which is what an incremental consumer needs to
    RETRACT the old contribution (qmv2's maintenance feed); the
    default single post-image 'update' row is the compact display
    form.

    `ts_from`/`ts_to` (r13 — Delta's startingTimestamp /
    endingTimestamp CDF addressing): pass unix-seconds instants
    instead of versions; each resolves to the newest version
    committed AT OR BEFORE that instant (version_as_of — the same
    rule AS OF TIMESTAMP time travel uses), so 'what changed between
    yesterday's snapshot and now' needs no version bookkeeping.
    Exactly one of (v_from, ts_from) and one of (v_to, ts_to) must
    be given."""
    import functools
    import operator

    from pyspark.sql import functions as F

    if key_cols is None:
        raise ValueError("table_changes requires key_cols")
    if (v_from is None) == (ts_from is None):
        raise ValueError("pass exactly one of v_from / ts_from")
    if (v_to is None) == (ts_to is None):
        raise ValueError("pass exactly one of v_to / ts_to")
    if ts_from is not None:
        v_from = version_as_of(path, ts_from)
    if ts_to is not None:
        v_to = version_as_of(path, ts_to)
    a = read_table(spark, path, v_from)
    b = read_table(spark, path, v_to)
    # a rename between the versions would make the same physical
    # column look dropped-and-added (every row a spurious update) —
    # refuse rather than mislead; diff within one mapping epoch
    if _column_map(_read_commits(path, v_from)) != _column_map(
        _read_commits(path, v_to)
    ):
        raise ValueError(
            "table_changes: the column mapping changed between "
            f"versions {v_from} and {v_to} (rename/drop is "
            "metadata-only); diff within one mapping epoch instead"
        )
    older, newer = (a, b) if v_to >= v_from else (b, a)
    gone = set(older.columns) - set(newer.columns)
    if gone:
        raise ValueError(
            f"table_changes: column(s) {sorted(gone)} were dropped "
            f"between versions {v_from} and {v_to}; a drop is "
            "metadata-only and would surface as spurious updates — "
            "diff within one mapping epoch instead"
        )
    # schema evolution only ADDS columns, so align the older side to
    # the newer shape with NULL fills: a pre-evolution row then diffs
    # as an UPDATE against its post-evolution image when the added
    # column gained a value — without this, the diff would silently
    # drop the added columns from the comparison and the output
    b_wider = len(b.columns) >= len(a.columns)
    cols = b.columns if b_wider else a.columns
    by_name = {
        f.name: f.dataType for f in (b.schema if b_wider else a.schema)
    }

    def aligned(df, prefix, marker):
        return df.select(
            *[
                (F.col(c) if c in df.columns
                 else F.lit(None).cast(by_name[c])).alias(f"{prefix}{c}")
                for c in cols
            ],
            F.lit(1).alias(marker),
        )

    nonkey = [c for c in cols if c not in key_cols]
    A = aligned(a, "_a_", "_in_a")
    B = aligned(b, "_b_", "_in_b")
    on = functools.reduce(
        operator.and_,
        [F.col(f"_a_{k}").eqNullSafe(F.col(f"_b_{k}")) for k in key_cols],
    )
    j = A.join(B, on, "full_outer")
    same = (
        F.struct(*[F.col(f"_a_{c}") for c in nonkey]).eqNullSafe(
            F.struct(*[F.col(f"_b_{c}") for c in nonkey])
        )
        if nonkey
        else F.lit(True)
    )
    if include_preimages:
        return _emit_change_pairs(j, cols, same)
    change = (
        F.when(F.col("_in_a").isNull(), F.lit("insert"))
        .when(F.col("_in_b").isNull(), F.lit("delete"))
        .when(same, F.lit(None).cast("string"))
        .otherwise(F.lit("update"))
    )
    out = [
        F.when(change == "delete", F.col(f"_a_{c}"))
        .otherwise(F.col(f"_b_{c}"))
        .alias(c)
        for c in cols
    ]
    return (
        j.withColumn("_change_type", change)
        .filter(F.col("_change_type").isNotNull())
        .select(*out, "_change_type")
    )


def commit_with_retry(fn, attempts: int = 8, backoff: float = 0.05):
    """Run `fn` (a zero-arg commit attempt — e.g. `lambda:
    merge_upsert(...)`) under the optimistic-concurrency protocol the
    module documents: on ConcurrentWriteError, sleep an exponential
    pid-jittered backoff and call `fn` again — each writer function
    re-reads the log on entry, so the retry automatically rebases onto
    the winner's commit. Bounded at `attempts` tries (the last
    ConcurrentWriteError propagates), so sustained contention surfaces
    instead of spinning. Returns whatever `fn` returns. This is the
    helper every multi-writer caller should wrap commits in rather
    than hand-rolling the re-read-and-retry loop (r11 verdict item 3);
    the two-process race itself is exercised for real in
    tests/test_capabilities.py::test_commit_log_two_process_race."""
    import time

    # deterministic per-process jitter: racing writers back off by
    # different amounts without driver-side randomness
    jitter = 1.0 + (os.getpid() % 97) / 97.0
    last: ConcurrentWriteError | None = None
    for attempt in range(max(int(attempts), 1)):
        try:
            return fn()
        except ConcurrentWriteError as e:
            last = e
            if attempt < attempts - 1:
                time.sleep(backoff * (2 ** attempt) * jitter)
    raise last


def latest_txn_version(path: str, app_id: str) -> int | None:
    """Highest transaction version committed for `app_id`, or None.
    Driver-side fold over the commit log — checkpoint-accelerated
    (O(tail) with a log checkpoint; the synthetic checkpoint commit
    carries the folded per-app `txn_watermarks` map)."""
    best = None
    for c in _read_state_commits(path):
        w = c.get("txn_watermarks", {}).get(app_id)
        if w is not None and (best is None or int(w) > best):
            best = int(w)
        t = c.get("txn")
        if t and t.get("app") == app_id:
            v = int(t["version"])
            best = v if best is None or v > best else best
    return best


def txn_append(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    app_id: str,
    txn_version: int,
    stats_cols: list[str] | None = None,
    create_ok: bool = False,
) -> int | None:
    """Idempotent append: commits `df` tagged {app_id, txn_version}
    and SKIPS (returns None) when a commit with the same app_id and a
    >= txn_version already exists — the Delta txnAppId/txnVersion
    protocol that makes foreachBatch exactly-once: a replayed epoch
    re-offers the same txn_version and is refused without reading the
    data. The skip-check and the version claim are not one atomic
    step, but the claim IS atomic (`_publish`), so a racing duplicate
    loses the claim with ConcurrentWriteError, and its retry re-reads
    the log and skips — no path double-commits an epoch. Empty
    batches commit a data-less entry so the txn watermark still
    advances. `create_ok` bootstraps the table on the first batch."""
    if create_ok and not table_versions(path):
        try:
            rel, stats = _write_data(df, path, 1, stats_cols)
            entry = {"version": 1, "operation": "create",
                     "added": [rel], "removed": [],
                     "schema": df.schema.simpleString(),
                     "schema_json": df.schema.json(),
                     "txn": {"app": app_id, "version": int(txn_version)}}
            if stats:
                entry["stats"] = {rel: stats}
            return _publish(path, entry)
        except ConcurrentWriteError:
            pass  # someone else created it: fall through to txn check
    seen = latest_txn_version(path, app_id)
    if seen is not None and seen >= int(txn_version):
        return None
    commits = _read_state_commits(path)
    df = _fill_generated(_fill_defaults(df, commits), commits)
    want = _latest_schema(commits)
    if want and df.schema.simpleString() != want:
        raise ValueError(
            f"txn_append schema {df.schema.simpleString()} != table "
            f"schema {want}"
        )
    version = commits[-1]["version"] + 1
    added, entry_stats = [], {}
    check_seen = _table_gate(commits)
    rel, stats = _write_data(
        df, path, version, stats_cols, check=check_seen,
        column_map=_column_map(commits), drop_if_empty=True,
        bloom_cols=_bloom_cols_logical(
            _live_stats(path, commits=commits), _column_map(commits)))
    if rel:
        added = [rel]
        if stats:
            entry_stats = {rel: stats}
    entry = {"version": version, "operation": "txn_append",
             "added": added, "removed": [],
             "txn": {"app": app_id, "version": int(txn_version)}}
    if entry_stats:
        entry["stats"] = entry_stats
    # lost races REBASE IN PLACE like append (blind appends commute):
    # re-check the watermark each time — the winner might have been
    # this very epoch's duplicate (then skip; the orphan directory is
    # invisible and vacuum reclaims it) — and re-claim the next
    # version without re-reading or re-writing the batch
    last: ConcurrentWriteError | None = None
    for _ in range(8):
        try:
            return _publish(path, entry)
        except ConcurrentWriteError as e:
            last = e
            seen = latest_txn_version(path, app_id)
            if seen is not None and seen >= int(txn_version):
                return None
            commits = _read_state_commits(path)
            # schema re-gate (r13 second review): a concurrent
            # evolution must not be bypassed by a blind rebase — the
            # already-written batch has the OLD shape; refuse, and
            # the foreachBatch retry re-runs txn_append fresh (new
            # default fill, new write) against the evolved table
            want = _latest_schema(commits)
            if want and df.schema.simpleString() != want:
                raise ValueError(
                    "txn_append: table schema changed while this "
                    f"batch was in flight ({df.schema.simpleString()} "
                    f"!= {want}); refusing the rebase — retry the "
                    "batch against the evolved table"
                )
            new_check = _table_gate(commits)
            if added and new_check != check_seen:
                # same rebase re-validation as append: a concurrently
                # added CHECK must veto this batch, not be bypassed
                _revalidate_dir(spark, path, added[0], new_check, commits)
                check_seen = new_check
            entry["version"] = commits[-1]["version"] + 1
            if added:
                # same rename as append's rebase: the directory-name
                # version is load-bearing for ExistsDefault
                new_rel = os.path.join(
                    _DATA,
                    f"v{entry['version']:08d}-"
                    + added[0].rsplit("-", 1)[1],
                )
                os.rename(os.path.join(path, added[0]),
                          os.path.join(path, new_rel))
                if entry_stats:
                    entry_stats = {new_rel: entry_stats[added[0]]}
                    entry["stats"] = entry_stats
                added = [new_rel]
                entry["added"] = added
    raise last


def exactly_once_sink(
    path: str,
    app_id: str,
    stats_cols: list[str] | None = None,
):
    """`writeStream.foreachBatch(exactly_once_sink(path, app))`:
    each micro-batch becomes one idempotent txn_append keyed by the
    epoch id, so a batch replayed after a failure (the foreachBatch
    at-least-once contract) is skipped instead of duplicated —
    end-to-end exactly-once into the commit-log table. Retries the
    claim through `commit_with_retry` — bounded attempts with
    exponential backoff, not an unthrottled spin (r11 advisory) — and
    each retry's txn_append re-runs the latest_txn_version skip-check
    BEFORE rewriting any data, so a race lost to this very epoch's
    duplicate skips without re-materializing the batch; only races
    lost to other writers' commits pay a rewrite, and only up to the
    attempt cap (orphan directories from lost attempts are invisible
    to readers and reclaimed by vacuum)."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        commit_with_retry(
            lambda: txn_append(
                batch_df.sparkSession, path, batch_df, app_id,
                int(epoch_id), stats_cols=stats_cols, create_ok=True,
            )
        )

    return _write


def vacuum(
    path: str,
    keep_versions: int = 1,
    retain_seconds: float | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Reclaim data directories no snapshot in the retention window
    can reach: keep everything live at any of the newest
    `keep_versions` versions; delete data dirs that are BOTH delisted
    before the window AND not referenced inside it. Time travel to
    versions older than the window stops working (their commit JSONs
    remain as provenance; reads raise on the missing dirs) — the same
    trade Delta's VACUUM makes, so the default keeps only the current
    version reachable, explicitly.

    `retain_seconds` WIDENS the window by publish time (Delta's
    RETAIN n HOURS): every version committed within the last
    `retain_seconds` stays reachable too, whatever keep_versions
    says — the guard that keeps a long-running reader's pinned
    snapshot alive as long as the pin is younger than the retention.
    `dry_run=True` returns what WOULD be reclaimed without touching
    the filesystem (Delta's VACUUM DRY RUN).

    Single-writer discipline applies: run vacuum from the (one)
    writer, never concurrently with a reader that pinned a snapshot
    older than the window — a pinned DataFrame holds paths, not locks.
    Returns the deleted relative paths. Orphan dirs from crashed
    writers (data written, commit never published) are also removed:
    they are invisible to every reader by construction."""
    import shutil
    import time

    versions = table_versions(path)
    if not versions:
        raise FileNotFoundError(f"no commit-log table at {path}")
    keep = versions[-max(keep_versions, 1):]
    if retain_seconds is not None:
        cutoff = time.time() - float(retain_seconds)
        recent = [
            int(c["version"])
            for c in _read_commits(path, None)
            if float(c.get("committed_at", 0.0)) >= cutoff
        ]
        keep = sorted(set(keep) | set(recent))
    reachable: set[str] = set()
    for v in keep:
        commits_v = _read_commits(path, v)
        reachable.update(_fold_live(commits_v))
        reachable.update(_fold_live_dvs(commits_v))
    ever: set[str] = set()
    keep_set = set(keep)
    for c in _read_commits(path, None):
        ever.update(c.get("added", []))
        ever.update(c.get("dv_added", []))
        # CDF sidecars belong to their COMMIT, not the live state:
        # retained while their version is in the kept window (a CDF
        # stream replaying the window still finds them), reclaimed
        # with the history past it
        ever.update(c.get("cdc", []))
        if int(c["version"]) in keep_set:
            reachable.update(c.get("cdc", []))
    on_disk: set[str] = set()
    for root in (_DATA, _DV, _CDC):
        full_root = os.path.join(path, root)
        if os.path.isdir(full_root):
            on_disk.update(
                os.path.join(root, d) for d in os.listdir(full_root)
            )
    # a clustered compact registers SUBDIRS of one write (e.g.
    # data/vN-x/_bucket=3) as separate relpaths, so a top-level dir is
    # an orphan only if NO committed relpath lives at or under it
    def _under(top: str, among: set[str]) -> bool:
        sep = top + os.sep
        return any(e == top or e.startswith(sep) for e in among)

    orphans = {d for d in on_disk if not _under(d, ever)}
    # committed-but-unreachable ∪ orphaned-on-disk
    doomed = sorted((ever - reachable) | orphans)
    if dry_run:
        return doomed
    for rel in doomed:
        shutil.rmtree(os.path.join(path, rel), ignore_errors=True)
    # clustered-write SHELLS: after every _bucket= relpath of a
    # clustered compact is reclaimed, the parent directory still holds
    # Spark's job markers (_SUCCESS, .crc) — rmdir alone fails and the
    # shell's relpaths stay in `ever`, so it would leak forever (r11
    # advisory). Sweep the data root: any top-level dir with no
    # REACHABLE relpath at/under it whose remaining entries are all
    # marker files gets the markers stripped and the dir removed —
    # this also reclaims shells leaked by earlier vacuums.
    data_root = os.path.join(path, _DATA)
    for d in (os.listdir(data_root) if os.path.isdir(data_root) else []):
        rel = os.path.join(_DATA, d)
        full = os.path.join(path, rel)
        if not os.path.isdir(full) or _under(rel, reachable):
            continue
        entries = os.listdir(full)
        if all(
            e.startswith(("_", ".")) and os.path.isfile(os.path.join(full, e))
            for e in entries
        ):
            for e in entries:
                os.unlink(os.path.join(full, e))
            try:
                os.rmdir(full)
            except OSError:
                pass
    return doomed
