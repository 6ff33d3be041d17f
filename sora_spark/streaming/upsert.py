"""Upsert (merge) sink via foreachBatch.

Plain parquet has no MERGE; the portable pattern is merge-by-rewrite
inside `foreachBatch`: union the micro-batch with the current table,
keep the latest row per key (event-time, batch rows win ties), and
atomically swap the directory. Correct under micro-batch replay
(idempotent: re-merging the same batch is a no-op), which is exactly
the foreachBatch exactly-once recipe. At real scale the rewrite should
be partition-scoped (only partitions containing touched keys) — here
the table is a dimension (small by definition), so full rewrite is the
honest simple form.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_batch(
    spark: SparkSession,
    table_path: str,
    batch_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
) -> None:
    """Merge one micro-batch into the parquet table at `table_path`,
    keeping the max-`ts_col` row per key (ties: batch side wins via
    the _src ordering)."""
    # recover from a crash between a previous merge's two renames
    # (same discipline as sources.maintenance.compact_parquet): data
    # at _old with no table dir -> restore; stale _old/_tmp -> clear
    old = table_path.rstrip("/") + "._merge_old"
    tmp_stale = table_path.rstrip("/") + "._merge_tmp"
    if os.path.isdir(old) and not os.path.isdir(table_path):
        os.rename(old, table_path)
    for stale in (old, tmp_stale):
        if os.path.isdir(stale):
            shutil.rmtree(stale)

    new = batch_df.withColumn("_src", F.lit(1))
    if os.path.isdir(table_path):
        cur = spark.read.parquet(table_path).withColumn("_src", F.lit(0))
        allrows = cur.unionByName(new)
    else:
        allrows = new
    # final tiebreak: content hash — two same-key same-ts rows in ONE
    # batch would otherwise pick a nondeterministic winner, breaking
    # the idempotent-replay contract this sink exists for
    row_hash = F.xxhash64(F.struct(*batch_df.columns))
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(ts_col), F.desc("_src"), F.desc(row_hash)
    )
    merged = (
        allrows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    tmp = table_path.rstrip("/") + "._merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(table_path):
        old = table_path.rstrip("/") + "._merge_old"
        os.rename(table_path, old)
        os.rename(tmp, table_path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, table_path)


def upsert_sink(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str,
):
    """Start a foreachBatch query that maintains `table_path` as the
    latest-row-per-key view of the stream."""
    spark = stream_df.sparkSession

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        merge_batch(spark, table_path, batch_df, key_cols, ts_col)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
