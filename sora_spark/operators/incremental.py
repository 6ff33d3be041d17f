"""Incremental aggregate maintenance (materialized-view delta refresh).

A grouped SUM/COUNT view over a 100 TB fact table must not be rebuilt
because a day's worth of CDC arrived. SUM and COUNT form an abelian
group under row insert/delete (update = delete old + insert new), so a
view can be maintained by aggregating ONLY the delta and merging the
signed partials into the stored state:

    view(G)  ->  view(G) (+) agg(delta)       one pass over the DELTA

The natural merge is a full-outer equi-join on the group key — but
Spark cannot broadcast the build side of a FULL OUTER join (HintError:
"build right for full outer join"), so that formulation would shuffle
the entire stored view to merge a tiny delta.  Instead the merge is
decomposed into three broadcast-only pieces (the aggregated delta is
one row per TOUCHED group, bounded by the CDC batch):

    touched   = view ⋈_bcast delta          (inner, add the partials)
    untouched = view ▷_bcast delta-keys     (left anti, pass through)
    new       = delta ▷_bcast touched-keys  (groups absent from view)

All three stream the view map-side against a broadcast hash table —
the view is scanned but never shuffled or collected.  Groups whose
maintained count reaches 0 are dropped, matching a recompute exactly.

AVG/stddev derive from (sum, sum_sq, count) carried in the same state;
MIN/MAX are NOT maintainable under deletes without a full per-group
rescan — callers needing them keep a per-group heap sideband or
recompute affected groups (documented limitation, same as every
incremental-view engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_view(
    df: DataFrame, group_cols: list[str], measures: list[str]
) -> DataFrame:
    """Initial materialization: group_cols..., n, sum_<m> per measure."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(m).alias(f"sum_{m}") for m in measures
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def delta_aggregate(
    cdc: DataFrame,
    group_cols: list[str],
    measures: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Signed per-group partials from a CDC batch.

    `op_col` ∈ {'I','D'} (updates arrive as a D of the old row plus an
    I of the new row — the canonical CDC encoding, cf. qup3 tombstones).
    One aggregation over the delta only; the view is untouched.
    """
    sign = (
        F.when(F.col(op_col) == "I", F.lit(1))
        .when(F.col(op_col) == "D", F.lit(-1))
        .otherwise(F.raise_error(F.concat(F.lit("bad CDC op: "), F.col(op_col))))
    )
    signed = cdc.withColumn("_sign", sign)
    aggs = [F.sum("_sign").alias("n")] + [
        F.sum(F.col("_sign") * F.col(m)).alias(f"sum_{m}") for m in measures
    ]
    return signed.groupBy(*group_cols).agg(*aggs)


def merge_view(
    view: DataFrame,
    deltas: DataFrame,
    group_cols: list[str],
    measures: list[str],
) -> DataFrame:
    """view (+) deltas → refreshed view. Groups with merged n == 0 are
    dropped (a recompute would not produce them). Every join here
    broadcasts delta-bounded data; the view side is only ever scanned
    (see module doc for why full-outer can't do this)."""
    v = view.alias("v")
    d = deltas.alias("d")

    def _cond(left: str, right: str):
        cond = None
        for k in group_cols:
            c = F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}"))
            cond = c if cond is None else cond & c
        return cond

    merged_cols = [
        (
            F.coalesce(F.col(f"v.{c}"), F.lit(0))
            + F.coalesce(F.col(f"d.{c}"), F.lit(0))
        ).alias(c)
        for c in ["n"] + [f"sum_{m}" for m in measures]
    ]
    touched = v.join(F.broadcast(d), _cond("v", "d"), "inner").select(
        *[F.col(f"v.{k}").alias(k) for k in group_cols], *merged_cols
    )
    untouched = v.join(
        F.broadcast(d.select(*group_cols)), _cond("v", "d"), "left_anti"
    )
    # delta groups the view has never seen: anti vs the (delta-bounded)
    # touched key set, so the big view never sits on a build side
    new = d.join(
        F.broadcast(touched.select(*group_cols).alias("t")),
        _cond("d", "t"),
        "left_anti",
    )
    return (
        untouched.unionByName(touched)
        .unionByName(new)
        .filter(F.col("n") != 0)
    )


def refresh(
    view: DataFrame,
    cdc: DataFrame,
    group_cols: list[str],
    measures: list[str],
    op_col: str = "op",
) -> DataFrame:
    """One-shot incremental refresh: aggregate the CDC batch, merge."""
    return merge_view(
        view,
        delta_aggregate(cdc, group_cols, measures, op_col),
        group_cols,
        measures,
    )
