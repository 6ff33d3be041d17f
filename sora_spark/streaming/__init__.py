"""Structured Streaming layer (SURVEY §2.9): file-replay sources over
the events fixture, windowed/sessionized/deduplicating streaming ops
with watermarks, memory-sink test harness.

Oracle strategy: DuckDB has no streams, so every streaming operator
declares its BATCH-equivalent form as the t2 query (queries/
streaming_q.py) and the streaming plan itself is checked by replay
self-consistency tests (tests/test_streaming.py): stream result ==
batch result, shuffled replay == ordered replay under a generous
watermark.
"""

from sora_spark.streaming import ops, replay  # noqa: F401
