"""Table registry over a scale-factor directory of parquet fixtures.

`Tables` is the engine's catalog for one dataset root: lazy attribute
access per table (DataFrames are lazy plans — nothing is scanned until
an action) plus temp-view registration for the SQL entry point
(SURVEY §3.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from sora_spark.sources.parquet import read_table

# Session-scoped plan cache: `spark.read.parquet` costs a driver-side
# file listing + footer schema read (~120-200 ms locally, worse on
# object stores) every call, and fixture tables are immutable — so the
# analyzed scan plan is cached per (sf_dir, table) in a dict attached
# to the SparkSession itself. Attachment (not a module-level weak map)
# makes cache lifetime exactly the session's: cached DataFrames hold a
# strong reference back to their session, which would keep a
# WeakKeyDictionary entry immortal (review finding, round 2).
_CACHE_ATTR = "_sora_plan_cache"


def _session_cache(spark: SparkSession) -> dict:
    cache = getattr(spark, _CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _CACHE_ATTR, cache)
    return cache

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


class Tables:
    """Lazy per-table access: `Tables(spark, sf_dir).lineitem` etc."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
        if name not in self._cache:
            per = _session_cache(self._spark)
            key = (self._sf_dir, name)
            if key not in per:
                per[key] = read_table(self._spark, self._sf_dir, name)
            self._cache[name] = per[key]
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return self.table(name)

    def register_views(self) -> None:
        """Register every table as a temp view for `spark.sql` use."""
        for name in TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)


def tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)


def register_analyzed_tables(
    spark: SparkSession,
    sf_dir: str,
    table_names: tuple[str, ...] = TABLE_NAMES,
    database: str = "sora_stats",
) -> str:
    """The cost-based-optimizer feed path (SCALE.md §CBO): register
    each fixture table as an EXTERNAL metastore table over its parquet
    path and run `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL
    COLUMNS`, so row counts, NDVs, min/max and null counts are
    available to `spark.sql.cbo.enabled` + joinReorder. Idempotent;
    returns the database name. Local tests/bench don't need this (AQE
    re-plans from runtime sizes), which is why it is a flag
    (SORA_ANALYZE=1 in bench.py) and not a default: at 100 TB with
    >3-way fact joins the REORDER decision must be made before the
    first shuffle executes, and only column stats can feed it then."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name in table_names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {database}.{name} "
            f"USING parquet LOCATION '{path}'"
        )
        spark.sql(
            f"ANALYZE TABLE {database}.{name} "
            "COMPUTE STATISTICS FOR ALL COLUMNS"
        )
    return database
