"""Replay the events fixture as a file stream.

The nanos-timestamp normalization happens once at materialization
(batch read through sources.parquet), so the streaming scan sees plain
microsecond timestamps — streaming readers never need the legacy conf.
`n_files` + `maxFilesPerTrigger=1` turns the replay into that many
micro-batches; `shuffled=True` hash-scatters rows across files to
simulate out-of-order arrival for watermark tests.
"""

from __future__ import annotations

import atexit
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sora_spark.sources.parquet import read_table

_SCRATCH = "/root/repo/.scratch/stream"
_CREATED: set[str] = set()


def _cleanup_scratch() -> None:
    for path in _CREATED:
        shutil.rmtree(path, ignore_errors=True)


atexit.register(_cleanup_scratch)


def _sweep_dead_pid_dirs() -> None:
    """Remove scratch dirs left by crashed processes (atexit never ran):
    any '<...>-pid<N>' dir whose pid is not alive is garbage."""
    try:
        entries = os.listdir(_SCRATCH)
    except OSError:
        return
    for entry in entries:
        pid_part = entry.rsplit("-pid", 1)
        if len(pid_part) != 2 or not pid_part[1].isdigit():
            continue
        pid = int(pid_part[1])
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(_SCRATCH, entry), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another user — leave it


def materialize_replay_dir(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    n_files: int = 4,
    shuffled: bool = False,
) -> str:
    """Write the normalized events table into `n_files` parquet files
    (time-ranged when ordered, md5-scattered when shuffled).

    The dir is keyed by (name, source sf, layout, fixture content
    stamp, pid) and reused when it already holds a completed write —
    repeated invocations in one process skip the rewrite — and every
    dir this process created is removed at exit, so runs don't
    accumulate fixture copies on disk (ADVICE r04). The content stamp
    (source mtime+size) means a regenerated fixture can never replay
    stale data even if a crashed run's dir survives into a recycled
    pid; dirs belonging to dead pids are swept opportunistically.
    """
    _sweep_dead_pid_dirs()
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    layout = f"shuf{n_files}" if shuffled else f"ord{n_files}"
    src = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
        stamp = f"{st.st_mtime_ns:x}.{st.st_size:x}"
    except OSError:
        stamp = "nosrc"
    path = os.path.join(
        _SCRATCH, f"{name}-{sf_tag}-{layout}-{stamp}-pid{os.getpid()}"
    )
    _CREATED.add(path)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    ev = read_table(spark, sf_dir, "events")
    if shuffled:
        part = ev.repartition(n_files, F.md5(F.col("event_id").cast("string")))
    else:
        part = ev.repartitionByRange(n_files, "ts")
    part.write.mode("overwrite").parquet(path)
    return path


def events_stream(spark: SparkSession, replay_dir: str) -> DataFrame:
    """File-source stream over a materialized replay dir, one file per
    micro-batch."""
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir)
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Drain a streaming frame into a memory sink and return the final
    table (blocks until all available input is processed).

    Memory-sink tables are session-global; a fixed `name` is dropped
    before restart so repeated invocations replace rather than leak
    catalog entries + driver memory (ADVICE r04)."""
    spark = stream_df.sparkSession
    spark.catalog.dropTempView(name)
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
