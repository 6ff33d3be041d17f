"""Source/sink layer: parquet (with the nanos-timestamp fix), CSV/JSONL
roundtrips, line-oriented text record parsing, and streaming replays."""

from sora_spark.sources.parquet import read_table, normalize_events

__all__ = ["read_table", "normalize_events"]
