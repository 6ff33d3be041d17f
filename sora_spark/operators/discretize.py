"""Quantile discretization (feature engineering): continuous column →
integer bucket ids with approximately equal mass.

Boundaries come from `approxQuantile` (Greenwald-Khanna sketch — one
pass, driver receives only n_buckets-1 doubles); assignment is a
literal-array binary search via JVM expressions (`array_position` on a
filtered boundary array would be O(n); `width_bucket` needs uniform
widths — instead we use the SQL `find_in_set`-free form: sum of
boundary comparisons, which codegen compiles to straight-line
branches). No shuffle at any point: one sketch pass + one map pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_discretize(
    df: DataFrame,
    col: str,
    n_buckets: int = 4,
    out_col: str | None = None,
    rel_err: float = 0.001,
    exact: bool = False,
    boundary_decimals: int | None = None,
) -> tuple[DataFrame, list[float]]:
    """Returns (df + bucket column in [0, n_buckets-1], boundaries).
    bucket(x) = #{b in boundaries : x > b} — monotone, NULL-safe
    (NULL stays NULL).

    `exact=True` computes boundaries with the exact `percentile`
    aggregate (linear interpolation — the same semantics as DuckDB's
    `quantile_cont`, proven portable by qa7) instead of the
    Greenwald-Khanna sketch: one full agg pass instead of one sketch
    pass, for when bucket edges must be engine-reproducible.
    `boundary_decimals` rounds the boundaries before assignment so a
    cross-engine comparison is immune to last-ulp interpolation
    differences."""
    out_col = out_col or f"{col}_bucket"
    probs = [i / n_buckets for i in range(1, n_buckets)]
    if exact:
        raw = df.agg(
            F.percentile(col, [float(p) for p in probs]).alias("q")
        ).collect()[0]["q"]
        # empty input: F.percentile aggregates to NULL (raw is None)
        # where approxQuantile returns [] — normalize so both modes
        # degrade to a single bucket
        raw = raw or []
    else:
        raw = df.approxQuantile(col, probs, rel_err)
    if boundary_decimals is not None:
        raw = [round(b, boundary_decimals) for b in raw]
    # dedupe: heavily-tied columns repeat a quantile boundary, which
    # would leave unreachable bucket ids — collapsing ties means ids
    # stay contiguous in [0, len(bounds)] (possibly < n_buckets; the
    # equal-mass contract is only as fine as the value distribution)
    bounds = sorted(set(raw))
    bucket = None
    for b in bounds:
        term = F.when(F.col(col) > b, 1).otherwise(0)
        bucket = term if bucket is None else bucket + term
    if bucket is None:
        bucket = F.lit(0)
    out = df.withColumn(
        out_col,
        F.when(F.col(col).isNotNull(), bucket).otherwise(F.lit(None)),
    )
    return out, bounds


def equal_width_histogram(
    df, col: str, n_bins: int = 16
):
    """Equal-width histogram → (bin, n, lo, hi per bin edge values).
    Pass 1 collects exactly TWO numbers (global min/max); pass 2 bins
    map-side (`floor((x-lo)/w)`, top edge clamped into the last bin)
    and aggregates — histogram-sized output, partial agg before the
    one exchange. The equal-WIDTH complement of quantile_discretize
    (equal-depth): width bins are mergeable across partitions/days
    without re-ranking, which is why monitoring pipelines prefer
    them."""
    from pyspark.sql import functions as F

    lo, hi = df.agg(F.min(col), F.max(col)).collect()[0]
    if lo is None or lo == hi:
        raise ValueError(f"degenerate domain for {col!r}: [{lo}, {hi}]")
    w = (hi - lo) / n_bins
    b = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(w)),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.select(b.alias("bin"), F.col(col).alias("_x"))
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.min("_x"), 2).alias("lo"),
            F.round(F.max("_x"), 2).alias("hi"),
        )
    )
