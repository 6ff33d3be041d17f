"""Table registry over a scale-factor directory of parquet fixtures.

`Tables` is the engine's catalog for one dataset root: lazy attribute
access per table (DataFrames are lazy plans — nothing is scanned until
an action) plus temp-view registration for the SQL entry point
(SURVEY §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sora_spark.sources.parquet import read_table

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
            self._cache[name] = read_table(self._spark, self._sf_dir, name)
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
