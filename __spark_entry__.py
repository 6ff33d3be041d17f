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


def _last_green_round() -> dict[str, int]:
    """Map query name -> latest round number with a fully-green
    CORRECTNESS row (rows+schema+hash).  Absent = never green."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        base = os.path.basename(path)
        try:
            rnd = int(base[len("CORRECTNESS_r") : -len(".json")])
        except ValueError:
            continue
        try:
            with open(path) as fh:
                rep = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rep.items():
            if isinstance(row, dict) and all(
                row.get(k) for k in ("rows_match", "schema_match", "hash_match")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _ordered_names() -> list[str]:
    """Registry order, rotated oldest-driver-check-first: queries whose
    most recent driver-green CORRECTNESS row is oldest (never-checked =
    oldest of all) come first, so a driver that checks only a 50-entry
    prefix keeps re-certifying the stalest results each round."""
    latest = _last_green_round()
    names = list(REGISTRY)
    return sorted(names, key=lambda n: (latest.get(n, -1), names.index(n)))


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
