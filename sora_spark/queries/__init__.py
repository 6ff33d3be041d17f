"""Importing this package populates the declared-query REGISTRY."""

from sora_spark.queries.registry import REGISTRY, Query, query  # noqa: F401
from sora_spark.queries import bench_core  # noqa: F401
from sora_spark.queries import relational  # noqa: F401
from sora_spark.queries import joins  # noqa: F401
from sora_spark.queries import aggs  # noqa: F401
from sora_spark.queries import windows  # noqa: F401
from sora_spark.queries import scalars  # noqa: F401
from sora_spark.queries import udf  # noqa: F401
from sora_spark.queries import graph_q  # noqa: F401
from sora_spark.queries import llm_q  # noqa: F401
from sora_spark.queries import streaming_q  # noqa: F401
from sora_spark.queries import pipeline_q  # noqa: F401
from sora_spark.queries import sql_surface  # noqa: F401
from sora_spark.queries import eval_q  # noqa: F401

__all__ = ["REGISTRY", "Query", "query"]
