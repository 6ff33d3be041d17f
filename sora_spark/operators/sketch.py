"""Mergeable frequent-items sketch (Misra-Gries) — the custom-sketch
counterpart to the built-in HLL/quantile sketches the engine already
uses (SURVEY §2.4 approx tier): bounded-memory heavy hitters over an
unbounded key domain.

Shape: one `mapInPandas` pass builds an MG(k) summary PER PARTITION
(exact partition counts pruned to k counters — a valid Misra-Gries
summary), one groupBy merges summaries by key, and a final k-prune
yields <= k candidates. Only k x n_partitions counter rows ever cross
the wire — the raw key stream never shuffles, which is the whole point
at 100 TB (a hot-token groupBy would shuffle billions of rows to count
what a 16-counter sketch answers).

Guarantee (mergeable summaries, Agarwal et al., PODS 2012): merging
MG(k) summaries by adding counters and subtracting the (k+1)-th
largest preserves the error bound — total undercount <= n/(k+1). So
every item with true frequency > n/(k+1) SURVIVES the merge, and each
reported weight w satisfies freq - n/(k+1) <= w <= freq. Property-
tested against exact counts in tests/test_capabilities.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """<= k frequent-item candidates of `df[col]` as (item, w) with
    the MG(k) lower-bound weight. Deterministic for a fixed
    partitioning of `df` up to the guarantee (the EXACT answer-set is
    partition-dependent, the guarantee is not — hence capability-tier,
    not hash-tier)."""
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")

    def _partials(batches):
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
        if len(counts) > k:
            kth = sorted(counts.values(), reverse=True)[k]
            counts = {v: c - kth for v, c in counts.items() if c > kth}
        yield pd.DataFrame(
            {"item": list(counts.keys()), "w": list(counts.values())}
        )

    partials = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        _partials, schema="item string, w long"
    )
    merged = partials.groupBy("item").agg(F.sum("w").alias("w"))
    # global k-prune: subtract the (k+1)-th largest merged weight.
    # merged has <= k x n_partitions rows, so the (k+1)-row collect is
    # sketch-sized driver data (same budget class as kmeans centroids).
    top = [r["w"] for r in merged.orderBy(F.desc("w")).limit(k + 1).collect()]
    kth = top[k] if len(top) > k else 0
    return (
        merged.withColumn("w", F.col("w") - F.lit(kth))
        .filter(F.col("w") > 0)
        .select("item", "w")
    )
