"""Parquet scan wrapper.

At 100 TB this is where scan efficiency is decided: we express reads
declaratively (`spark.read.parquet`) so Catalyst pushes predicates into
row-group min/max stats and prunes columns at the footer level
(SURVEY §4.1) — callers should `.select()`/`.filter()` the returned
DataFrame and let pushdown happen, never pre-collect.

The one piece of engine-side work is the `events` table: its `ts`
column is parquet INT64 TIMESTAMP(NANOS, false), which stock Spark 4
refuses to read ([PARQUET_TYPE_ILLEGAL]). With
`spark.sql.legacy.parquet.nanosAsLong=true` the column arrives as long
nanoseconds; we truncate (integer division — double division would
lose microsecond precision at 1.7e18 nanos) to microseconds, exactly
matching DuckDB's native nanos→µs truncation (SURVEY §1.4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from sora_spark.session import prepare_session


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize `ts` to a microsecond TimestampType regardless of the
    fixture's physical encoding.

    Two encodings exist in the wild: TIMESTAMP(NANOS) (arrives as long
    nanoseconds under nanosAsLong — truncate to µs), and naive
    timestamp[us] (arrives as TIMESTAMP_NTZ — cast; the session runs in
    UTC so the wall-clock value is preserved exactly, matching DuckDB's
    naive reading). Everything downstream assumes TimestampType.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(dt, TimestampNTZType):
        # The NTZ→timestamp cast reinterprets the wall-clock value in the
        # SESSION timezone; only UTC preserves the instant the oracle
        # reads. prepare_session sets it but cannot on a static-conf
        # session — fail loudly rather than hash shifted hours. Any
        # fixed-zero-offset zone id is instant-preserving, not just the
        # literal "UTC" (cluster defaults often inject an alias).
        _utc_aliases = {
            "UTC", "Etc/UTC", "Etc/Universal", "Etc/Zulu", "Universal",
            "Zulu", "GMT", "GMT0", "Etc/GMT", "Etc/GMT0", "Etc/GMT+0",
            "Etc/GMT-0", "Etc/Greenwich", "Greenwich", "Z", "+00:00",
            "UTC+00:00", "GMT+00:00",
        }
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz not in _utc_aliases:
            raise RuntimeError(
                "events ts is TIMESTAMP_NTZ and spark.sql.session.timeZone="
                f"{tz!r}; the cast to timestamp is only instant-preserving "
                "under UTC. Set the session timezone to UTC."
            )
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; applies the events ts normalization."""
    prepare_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events(df)
    return df
