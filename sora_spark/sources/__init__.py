"""Source/sink layer: parquet (with the nanos-timestamp fix), CSV/JSONL/
ORC roundtrips, line-oriented text record parsing (plus the FASTA
Python DataSource), small-file compaction, and streaming replays."""

from sora_spark.sources.maintenance import compact_parquet
from sora_spark.sources.parquet import normalize_events, read_table
from sora_spark.sources.text import read_fasta

__all__ = ["read_table", "normalize_events", "read_fasta", "compact_parquet"]
