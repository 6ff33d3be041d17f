"""Time-series regularization: resample to a fixed grid + gap fill.

The missing piece between raw event streams and window analytics is a
REGULAR series: one row per (key, bucket) even where no events fell,
with carried-forward values. Shapes used (all shuffle-bounded):

- bucketing = `date_trunc`-style window start (map-side expression);
- the per-key dense grid = `sequence(min, max, interval)` + explode —
  grid size is span/step per key, generated distributed, never on the
  driver;
- forward fill = `last(value, ignorenulls=True)` over an unbounded-
  preceding ROWS window per key — one shuffle on the key, the same
  partitioning the grid join already produced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step: str = "1 hour",
    aggs: list | None = None,
) -> DataFrame:
    """One row per (key, bucket_start) for buckets that HAVE events."""
    aggs = aggs or [F.count("*").alias("n_events")]
    return (
        df.groupBy(
            F.col(key_col),
            F.window(ts_col, step)["start"].alias("bucket"),
        )
        .agg(*aggs)
    )


def fill_gaps(
    bucketed: DataFrame,
    key_col: str,
    bucket_col: str,
    step: str,
    value_cols: list[str],
) -> DataFrame:
    """Dense per-key grid from each key's first to last bucket, with
    `value_cols` forward-filled across empty buckets; `_present`
    marks original rows."""
    bounds = bucketed.groupBy(key_col).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
        ).alias(bucket_col),
    )
    joined = grid.join(
        bucketed.withColumn("_present", F.lit(True)),
        [key_col, bucket_col],
        "left",
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.withColumn("_present", F.coalesce("_present", F.lit(False)))
