"""Interval overlap join (genomic-range style): pairs of rows whose
[start, end) intervals overlap, optionally per grouping key (e.g.
chromosome / user).

Scale shape: each interval explodes into the fixed-size BINS it
touches; candidates come from an equi-join on (key, bin) — an
ordinary shuffle join bounded by per-bin occupancy, never the all-pairs
theta join `a.start < b.end AND b.start < a.end` (which Spark can only
execute as a nested-loop at scale). The overlap predicate then
verifies exactly, and dedup keeps one row per pair even when a pair
shares several bins. Bin size tunes the blocking: ~the median interval
length is a good default; too small explodes rows, too large packs
bins."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sora_spark.operators._util import suffix_columns


def _with_bins(df: DataFrame, start: str, end: str, bin_size: int):
    return df.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(start) / bin_size).cast("long"),
                ((F.col(end) - 1) / bin_size).cast("long"),
            )
        ),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | None = None,
    start_cols: tuple[str, str] = ("start", "start"),
    end_cols: tuple[str, str] = ("end", "end"),
    bin_size: int = 1000,
) -> DataFrame:
    """Overlapping pairs ([start,end) semantics). Column names on the
    right side are suffixed `_r` in the output; `key` (if given) must
    match on both sides and keeps blocking per-key."""
    ls, le = start_cols[0], end_cols[0]
    rs, re_ = start_cols[1] + "_r", end_cols[1] + "_r"
    r = suffix_columns(right, "_r")
    lb = _with_bins(left, ls, le, bin_size)
    rb = _with_bins(r, rs, re_, bin_size)
    if key is None:
        on = ["_bin"]
    else:
        rb = rb.withColumnRenamed(key + "_r", key)
        on = [key, "_bin"]
    overlap = (F.col(ls) < F.col(re_)) & (F.col(rs) < F.col(le))
    # a pair touching several shared bins appears once per bin; after
    # dropping _bin those rows are identical — full-row dedup. Output
    # is therefore distinct ROW-VALUE pairs: bytewise-identical input
    # rows collapse; carry a unique id column when row identity matters.
    return lb.join(rb, on).filter(overlap).drop("_bin").dropDuplicates()


def interval_union(
    df,
    key_col: str,
    start_col: str,
    end_col: str,
):
    """Merged-interval coverage per key → (key, n_islands,
    covered_len): overlapping/adjacent [start, end) intervals are
    merged ("islands"), then counted and their total covered length
    summed — the classic genomics/observability union op (covered
    bases per chromosome, total uptime per service).

    One pass, windowed sweep — the only shape that scales: intervals
    are sorted per key (ONE shuffle on the key), a running max of
    prior ends marks island starts (start > max of all previous ends),
    a cumulative sum of those markers assigns island ids, and a
    per-island min/max aggregation (same key prefix — no extra
    shuffle) yields the merged spans. Never materializes pairwise
    overlaps, so a key with n intervals costs n log n locally instead
    of the n² an overlap self-join would."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prior_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prior_max_end.isNull() | (F.col(start_col) > prior_max_end), 1
    ).otherwise(0)
    marked = df.select(
        key_col,
        start_col,
        end_col,
        F.sum(new_island)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_island"),
    )
    islands = marked.groupBy(key_col, "_island").agg(
        F.min(start_col).alias("_s"), F.max(end_col).alias("_e")
    )
    return islands.groupBy(key_col).agg(
        F.count("*").cast("bigint").alias("n_islands"),
        F.sum(F.col("_e") - F.col("_s")).cast("bigint").alias("covered_len"),
    )
