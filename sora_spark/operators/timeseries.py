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


def time_rollup(
    df: DataFrame,
    ts_col: str,
    grains: list[str],
    aggs: list,
) -> DataFrame:
    """Hypertable-style multi-granularity rollup in ONE pass: truncate
    the timestamp to each grain (map-side expressions), then ROLLUP
    over the grain columns coarse→fine, so a single shuffle produces
    every aggregation level (hour, day, grand total) at once — the
    continuous-aggregate maintenance shape, instead of one job per
    granularity. `grains` is ordered coarse→fine (e.g. ["day",
    "hour"]); output carries a `grain` label per row ('total', then
    each grain name). Partial aggregation still applies: the map side
    combines before the one exchange, and each coarser level is
    Catalyst's Expand over the same scan, not a rescan.
    """
    truncs = [F.date_trunc(g, F.col(ts_col)).alias(g) for g in grains]
    # grain label from grouping() flags, NOT isNull — a NULL timestamp
    # must stay a data row at the finest grain, not masquerade as a
    # rollup subtotal
    grain = F.when(F.grouping(grains[0]) == 1, "total")
    for i, g in enumerate(grains[1:], start=1):
        grain = grain.when(F.grouping(g) == 1, grains[i - 1])
    grain = grain.otherwise(grains[-1])
    return (
        df.select(*truncs, "*")
        .rollup(*grains)
        .agg(*aggs, grain.alias("grain"))
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    alpha: float = 0.7,
    k: int = 5,
) -> DataFrame:
    """Bounded-window EWMA: weighted mean of the last `k` observations
    per key with geometric weights alpha^j → appends `ewma`. The
    truncated form (rather than the infinite recursion) is what a
    distributed engine should run: state is k lag() slots per row —
    whole-stage codegen, one shuffle on the key — while the recursive
    definition is inherently sequential per partition. Series heads
    renormalize over the lags that exist (no zero-padding bias)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(k):
        lag_j = F.col(value_col) if j == 0 else F.lag(value_col, j).over(w)
        wgt = F.lit(alpha**j)
        num = num + wgt * F.coalesce(lag_j, F.lit(0.0))
        den = den + wgt * lag_j.isNotNull().cast("double")
    return df.withColumn("ewma", num / den)
