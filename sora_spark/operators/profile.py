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
    # typed-expression unpivot — column names enter as F.lit values,
    # never interpolated into a SQL string, so a name containing a
    # quote/comma/backtick cannot malform the expression (ADVICE r06)
    args: list = []
    for i, f_ in enumerate(df.schema.fields):
        args.extend(
            [
                F.lit(f_.name),
                F.col(f"nn_{i}"),
                F.col(f"nd_{i}"),
                F.col(f"mn_{i}"),
                F.col(f"mx_{i}"),
            ]
        )
    return row.select(
        F.stack(F.lit(n), *args).alias(
            "column", "n_nulls", "n_distinct", "min_num", "max_num"
        )
    )


def histogram_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    n_bins: int = 16,
) -> DataFrame:
    """Distribution drift between two snapshots of a column → one row
    (l1_distance, n_old, n_new): equal-width histograms over the
    COMBINED domain, normalized to mass 1, L1-compared. The
    snapshot-to-snapshot data-drift monitor (alert when a feed's value
    distribution shifts) in the only shape that scales: two map-side
    binning passes + a histogram-sized join — never a global sort, so
    no exact-KS single-partition bottleneck. L1/2 is total variation
    distance; 0 = identical binned distributions, 1 = disjoint."""
    both = old.select(F.col(col).alias("_x")).unionByName(
        new.select(F.col(col).alias("_x"))
    )
    lo, hi = both.agg(F.min("_x"), F.max("_x")).collect()[0]
    if lo is None or lo == hi:
        raise ValueError(f"degenerate domain for {col!r}: [{lo}, {hi}]")
    w = (hi - lo) / n_bins

    def hist(df):
        b = F.least(
            F.floor((F.col(col) - F.lit(lo)) / F.lit(w)), F.lit(n_bins - 1)
        ).cast("int")
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count("*").alias("n")
        )

    ho = hist(old).alias("o")
    hn = hist(new).alias("n")
    j = ho.join(hn, F.col("o.bin") == F.col("n.bin"), "full_outer").select(
        F.coalesce(F.col("o.n"), F.lit(0)).alias("n_old"),
        F.coalesce(F.col("n.n"), F.lit(0)).alias("n_new"),
    )
    totals = j.agg(
        F.sum("n_old").alias("_to"), F.sum("n_new").alias("_tn")
    )
    # histogram-sized cross join against the 1-row totals frame
    return (
        j.crossJoin(F.broadcast(totals))
        .agg(
            F.round(
                F.sum(
                    F.abs(
                        F.col("n_old") / F.col("_to")
                        - F.col("n_new") / F.col("_tn")
                    )
                ),
                6,
            ).alias("l1_distance"),
            F.sum("n_old").cast("bigint").alias("n_old"),
            F.sum("n_new").cast("bigint").alias("n_new"),
        )
    )
