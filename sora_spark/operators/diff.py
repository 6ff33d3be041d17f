"""Snapshot diff (CDC-style): compare two versions of a keyed table →
(key, change) with change ∈ {added, removed, changed}.

One full-outer equi-join on the key; non-key columns are compared via
a single md5 over their concatenated canonical forms (computed
map-side on each snapshot before the join, so the shuffle carries
key + 32-byte hash, never the payload — the property that matters
when diffing two 100 TB snapshots)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame, key_cols: list[str]):
    payload = [c for c in df.columns if c not in key_cols]
    # canonical: NULL -> sentinel, fixed column order, unit separator
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
        for c in sorted(payload)
    ]
    return F.md5(F.concat_ws("\x1f", *parts))


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """→ (key_cols..., change). Unchanged rows are omitted."""
    o = old.select(*key_cols, _row_hash(old, key_cols).alias("_ho"))
    n = new.select(*key_cols, _row_hash(new, key_cols).alias("_hn"))
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_ho").isNull(), "added")
        .when(F.col("_hn").isNull(), "removed")
        .when(F.col("_ho") != F.col("_hn"), "changed")
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )
