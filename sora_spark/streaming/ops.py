"""Streaming operators (SURVEY §2.9): tumbling / sliding / session
windows, streaming dedup — each the streaming twin of a declared
batch-oracle query. Watermarks bound state: at 100 TB-scale streams
the watermark is what keeps window/session/dedup state finite, and
the RocksDB state store (config, not code) takes over from the
in-memory store used at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1-hour tumbling window × event_type → count, sum(value). The
    streaming twin of qs1 (batch groups by the formatted hour)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "3 hours") -> DataFrame:
    """2-hour windows sliding 1 hour (each event lands in 2 windows) —
    streaming twin of qs2."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("window.start", TS_FMT).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "31 days") -> DataFrame:
    """Per-user session windows with a 30-minute gap — streaming twin
    of qs3. A new event merges into a session while it arrives strictly
    inside (last_ts + gap); the batch form therefore starts a new
    session when the time delta is >= gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
    )


def stream_dedup(events: DataFrame, watermark: str = "31 days") -> DataFrame:
    """First event per (user_id, event_type) — streaming twin of qs4.
    Streaming dropDuplicates keeps the first ARRIVAL, so it equals the
    batch earliest-by-ts form exactly when the replay is time-ordered
    (asserted by the self-consistency test)."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type"]
    )


def stream_dedup_within_watermark(
    events: DataFrame, delay: str = "31 days"
) -> DataFrame:
    """`dropDuplicatesWithinWatermark`: like `stream_dedup` but state
    for a key is dropped once the watermark passes its first-seen ts +
    `delay` — the BOUNDED-state dedup for infinite streams (plain
    streaming dropDuplicates holds every key forever). With `delay`
    covering the replay span it must equal the unbounded form."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
