"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the sora_spark declared-query registry
(sora_spark/queries/registry.py): every implemented operator from
SURVEY.md §2 is one registry row carrying both the Spark
implementation and (where SQL-expressible) its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sora_spark.queries import REGISTRY

_FLAGSHIP = "qa1_pricing_summary"
_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (B1 pricing summary) on /root/testdata/sf0.001."""
    return REGISTRY[_FLAGSHIP].spark_fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys → rows-only check."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
