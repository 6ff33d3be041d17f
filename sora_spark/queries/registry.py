"""Declared-query registry — the t2 contract surface (SURVEY §2.0).

Every operator the engine claims is declared here as a `Query`:
a Spark implementation `(spark, sf_dir) -> DataFrame` plus, where
SQL-expressible, the equivalent DuckDB oracle SQL. The driver runs
both at sf0.01 and compares row-count + schema + order-insensitive
value hash; `__spark_entry__` simply re-exports this registry.

Determinism rules baked into every declared query (SURVEY §2.0, §5.5):
- total ORDER BY (all output columns or a unique key) before any LIMIT;
- round(x, d) on every float output;
- timestamps are formatted to strings in BOTH engines (sidesteps
  tz/precision/serializer drift entirely);
- NULLS FIRST/LAST stated explicitly on nullable sort keys;
- aggregate outputs aliased identically on both sides;
- integer aggregates cast to BIGINT in the oracle (DuckDB sum(int)
  is HUGEINT, which Spark has no analog for).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark_fn: SparkFn
    oracle: str | None  # DuckDB SQL; None → rows-only check (no-oracle row)
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a declared query under `name`."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco
