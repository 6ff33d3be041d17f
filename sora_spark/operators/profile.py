"""Table profiling: the per-column data-quality report (null rate,
exact distinct count, numeric range) every ingestion pipeline runs
before trusting a new 100 TB drop.

ONE aggregation pass computes every column's statistics side by side
(null counts, count_distinct, min/max — all partial-aggregable, so the
shuffle carries one moment tuple per column), then a `stack` unpivots
the single result row into (column, ...) rows driver-free. Min/max are
reported only for numeric columns, as rounded doubles: stringifying
timestamps/doubles for a generic profile invites cross-engine format
drift (exponent notation, trailing zeros) — a typed report doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame, round_digits: int = 2) -> DataFrame:
    """→ (column, n_nulls, n_distinct, min_num, max_num), one row per
    input column, numeric extrema rounded, non-numeric extrema NULL."""
    aggs = []
    for i, f_ in enumerate(df.schema.fields):
        c = F.col(f_.name)
        aggs.append(F.sum(c.isNull().cast("bigint")).alias(f"nn_{i}"))
        aggs.append(F.count_distinct(c).alias(f"nd_{i}"))
        if isinstance(f_.dataType, NumericType):
            aggs.append(
                F.round(F.min(c).cast("double"), round_digits).alias(f"mn_{i}")
            )
            aggs.append(
                F.round(F.max(c).cast("double"), round_digits).alias(f"mx_{i}")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"mn_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"mx_{i}"))
    row = df.agg(*aggs)
    n = len(df.schema.fields)
    parts = ", ".join(
        f"'{f_.name}', nn_{i}, nd_{i}, mn_{i}, mx_{i}"
        for i, f_ in enumerate(df.schema.fields)
    )
    return row.selectExpr(
        f"stack({n}, {parts}) AS (column, n_nulls, n_distinct, "
        "min_num, max_num)"
    )
