"""Custom operators Spark lacks as single primitives (SURVEY §4.2):
as-of joins, top-k helpers. Each is a composition of DataFrame ops —
never driver-side loops — so Catalyst/AQE still plan the physical
strategy.
"""

from sora_spark.operators.asof import asof_join

__all__ = ["asof_join"]
