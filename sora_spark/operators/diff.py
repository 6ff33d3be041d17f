"""Snapshot diff (CDC-style): compare two versions of a keyed table →
(key, change) with change ∈ {added, removed, changed}.

One full-outer equi-join on the key; non-key columns are compared via
one xxhash64 over the typed column values (computed map-side on each
snapshot before the join, so the shuffle carries key + 8-byte hash,
never the payload — the property that matters when diffing two 100 TB
snapshots). Hash equality is a 64-bit check: a changed row escapes
detection with probability 2^-64 per key — the standard CDC trade;
rerun with the payload columns as extra keys where that is not
acceptable."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame, key_cols: list[str]):
    payload = [c for c in df.columns if c not in key_cols]
    if not payload:
        # every column is a key: rows are their keys — constant hash
        # so the join reports only added/removed, never changed
        return F.lit(0).cast("long")
    # xxhash64 over (null-flag, value) per column: Spark's hash SKIPS
    # null children without perturbing the accumulator, so without the
    # explicit flags (NULL,'x') and ('x',NULL) would collide
    # deterministically (review finding, round 2). The int flag is
    # never null, so every column perturbs the hash exactly once.
    parts = []
    for c in sorted(payload):
        parts.append(F.isnull(F.col(c)).cast("int"))
        parts.append(F.col(c))
    return F.xxhash64(*parts)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """→ (key_cols..., change). Unchanged rows are omitted."""
    o = old.select(
        *key_cols, _row_hash(old, key_cols).alias("_ho")
    ).alias("o")
    n = new.select(
        *key_cols, _row_hash(new, key_cols).alias("_hn")
    ).alias("n")
    # eqNullSafe: a NULL in the key tuple matches a NULL on the other
    # side, so such rows diff as unchanged/changed instead of showing
    # up once as 'added' AND once as 'removed' (review finding)
    cond = None
    for k in key_cols:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("_ho").isNull(), "added")
        .when(F.col("_hn").isNull(), "removed")
        .when(F.col("_ho") != F.col("_hn"), "changed")
    )
    keys = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k)
        for k in key_cols
    ]
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )


def three_way_merge_classes(
    base: DataFrame,
    ours: DataFrame,
    theirs: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Concurrent-writer reconciliation: classify every key touched by
    either branch against the common base → (key_cols..., ours_change,
    theirs_change, resolution), resolution ∈ {ours, theirs, conflict}.
    A key changed (or removed) by BOTH branches is a conflict the
    merge cannot auto-resolve; one-sided changes adopt that side.
    Untouched keys are omitted — at 100 TB the output is bounded by
    the CHANGE volume, never the table. Two snapshot_diffs (key +
    8-byte hash shuffles only) + one full-outer join of the two
    change-bounded outputs."""
    do = snapshot_diff(base, ours, key_cols).withColumnRenamed(
        "change", "ours_change"
    )
    dt = snapshot_diff(base, theirs, key_cols).withColumnRenamed(
        "change", "theirs_change"
    )
    o = do.alias("o")
    t = dt.alias("t")
    cond = None
    for k in key_cols:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"t.{k}"))
        cond = c if cond is None else cond & c
    j = o.join(t, cond, "full_outer")
    keys = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"t.{k}")).alias(k)
        for k in key_cols
    ]
    resolution = (
        F.when(
            F.col("ours_change").isNotNull()
            & F.col("theirs_change").isNotNull(),
            "conflict",
        )
        .when(F.col("ours_change").isNotNull(), "ours")
        .otherwise("theirs")
    )
    return j.select(
        *keys, "ours_change", "theirs_change", resolution.alias("resolution")
    )
