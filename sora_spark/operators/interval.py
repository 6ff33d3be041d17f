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
