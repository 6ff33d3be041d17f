"""Importing this package populates the declared-query REGISTRY."""

from sora_spark.queries.registry import REGISTRY, Query, query  # noqa: F401
from sora_spark.queries import bench_core  # noqa: F401

__all__ = ["REGISTRY", "Query", "query"]
