"""As-of (event-time) join: for each left row, the most recent
right row with right.time strictly earlier, per key (SURVEY Q-J8).

Implemented as union + window rather than a range join: tagging both
sides and running one `last(right_value) OVER (ROWS ... 1 PRECEDING)`
costs a single shuffle on the key and NEVER materializes candidate
pairs — the range-join formulation explodes on hot keys at 100 TB,
this one stays linear in input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType
from pyspark.sql.window import Window


def _tagged_union(left, right, key, time_col, tiebreak_col, right_value_col):
    """Shared construction for every asof direction: tag left rows
    _side=0 with a NULL (time, value) pair; reduce right rows to
    key/time/tiebreak plus the non-NULL-value struct _rp (NULL right
    values stay a NULL struct so last(ignorenulls) skips them); pad
    the right side with typed NULLs for the left's payload columns so
    the union resolves for any left schema."""
    rv_type = right.schema[right_value_col].dataType
    t_type = right.schema[time_col].dataType
    pair_type = f"struct<_t:{t_type.simpleString()},_v:{rv_type.simpleString()}>"

    lt = left.withColumn("_side", F.lit(0)).withColumn(
        "_rp", F.lit(None).cast(pair_type)
    )
    rt = (
        right.select(
            key,
            time_col,
            tiebreak_col,
            F.when(
                F.col(right_value_col).isNotNull(),
                F.struct(
                    F.col(time_col).alias("_t"),
                    F.col(right_value_col).alias("_v"),
                ),
            ).alias("_rp"),
        )
        .withColumn("_side", F.lit(1))
    )
    shared = {key, time_col, tiebreak_col, "_rp", "_side"}
    for f_ in left.schema.fields:
        if f_.name not in shared:
            rt = rt.withColumn(f_.name, F.lit(None).cast(f_.dataType))
    return lt.unionByName(rt.select(*lt.columns))


def _tol_expr(tolerance):
    return (
        F.expr(f"INTERVAL {tolerance}")
        if isinstance(tolerance, str)
        else F.lit(tolerance)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    tiebreak_col: str,
    right_value_col: str,
    out_col: str = "asof_value",
    tolerance: str | float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + `out_col` = right's `right_value_col` at the latest
    strictly-earlier (time_col, tiebreak_col) for the same `key` —
    or, with direction="forward", the EARLIEST strictly-later one
    (pandas merge_asof's direction flag; the same union+window shape
    with the time order reversed, so still one shuffle, no pair
    materialization).

    Both frames must share key/time/tiebreak column names; right rows
    only contribute `right_value_col`. Left rows with no earlier right
    row get NULL.

    `tolerance` (pandas merge_asof-style) bounds how stale (backward)
    or distant (forward) the match may be: matches outside
    `left.time ± tolerance` become NULL. Pass an interval string
    (e.g. "5 minutes") for timestamp time columns or a number for
    numeric ones.

    direction="nearest" picks whichever side is closer in time (ties
    to backward) and ALSO emits `out_col + "_t"`, the matched right
    row's time — callers need it to audit which direction won.
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, key, time_col, tiebreak_col, right_value_col,
            out_col, tolerance,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction!r}"
        )
    unioned = _tagged_union(
        left, right, key, time_col, tiebreak_col, right_value_col
    )
    # Left rows sort BEFORE right rows at equal time (side 0 < 1), so the
    # preceding frame for a left row holds exactly the strictly-earlier
    # right rows; `last` over it is the latest such (time, value) pair
    # (max would be wrong for any non-monotone right value, e.g. a price).
    # Forward direction = the same construction over REVERSED time
    # order: preceding rows are then the strictly-LATER right rows and
    # last() picks the one nearest the left row. _side stays ascending
    # in both: left-before-right at equal time keeps equal-time right
    # rows out of the frame (strict inequality either way).
    if direction == "backward":
        order = [F.col(time_col).asc(), F.col("_side").asc(),
                 F.col(tiebreak_col).asc()]
    else:
        order = [F.col(time_col).desc(), F.col("_side").asc(),
                 F.col(tiebreak_col).desc()]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = F.last("_rp", ignorenulls=True).over(w)
    value = matched["_v"]
    if tolerance is not None:
        tol = _tol_expr(tolerance)
        if direction == "backward":
            value = F.when(matched["_t"] >= F.col(time_col) - tol,
                           matched["_v"])
        else:
            value = F.when(matched["_t"] <= F.col(time_col) + tol,
                           matched["_v"])
    return (
        unioned.withColumn(out_col, value)
        .filter(F.col("_side") == 0)
        .drop("_side", "_rp")
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    tiebreak_col: str,
    right_value_col: str,
    out_col: str,
    tolerance: str | float | None,
) -> DataFrame:
    """direction="nearest": whichever of the strictly-earlier and
    strictly-later right matches is closer in time; ties prefer the
    BACKWARD (earlier) match — stated rule, certified by the qj8d
    oracle. Built as the backward and forward window passes over ONE
    union: same partitionBy, two orderings, so Catalyst reuses the
    single hash exchange and pays one extra sort — never a second
    shuffle, never a candidate-pair join. Tolerance bounds each
    direction before the comparison (a stale backward match loses to
    an in-range forward one)."""
    unioned = _tagged_union(
        left, right, key, time_col, tiebreak_col, right_value_col
    )
    w_back = (
        Window.partitionBy(key)
        .orderBy(
            F.col(time_col).asc(), F.col("_side").asc(),
            F.col(tiebreak_col).asc(),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(
            F.col(time_col).desc(), F.col("_side").asc(),
            F.col(tiebreak_col).desc(),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    back = F.last("_rp", ignorenulls=True).over(w_back)
    fwd = F.last("_rp", ignorenulls=True).over(w_fwd)
    if tolerance is not None:
        tol = _tol_expr(tolerance)
        back = F.when(back["_t"] >= F.col(time_col) - tol, back)
        fwd = F.when(fwd["_t"] <= F.col(time_col) + tol, fwd)
    t = F.col(time_col)
    # Exact gap arithmetic: epoch-double casts carry ~2.4e-7 s
    # representation error, enough to flip the backward/forward choice
    # on 1-microsecond-different gaps vs an exact-microsecond oracle.
    dt = unioned.schema[time_col].dataType
    if isinstance(dt, TimestampNTZType):
        # NTZ gaps must come from the wall-clock values themselves:
        # routing through a session-tz TIMESTAMP cast only cancels in
        # the gap for fixed-offset zones — across a DST transition the
        # two casts apply different offsets and the gap deviates from
        # the wall-clock difference (review finding). Direct NTZ
        # subtraction yields an exact-microsecond DayTimeInterval,
        # which compares natively below.
        gap_back = t - back["_t"]
        gap_fwd = fwd["_t"] - t
    elif isinstance(dt, TimestampType):
        gap_back = F.unix_micros(t) - F.unix_micros(back["_t"])
        gap_fwd = F.unix_micros(fwd["_t"]) - F.unix_micros(t)
    else:
        gap_back = t.cast("double") - back["_t"].cast("double")
        gap_fwd = fwd["_t"].cast("double") - t.cast("double")
    pick = (
        F.when(back.isNull(), fwd)
        .when(fwd.isNull(), back)
        .when(gap_back <= gap_fwd, back)  # tie -> backward, stated rule
        .otherwise(fwd)
    )
    return (
        unioned.withColumn("_pick", pick)
        .filter(F.col("_side") == 0)
        .withColumn(out_col, F.col("_pick")["_v"])
        .withColumn(out_col + "_t", F.col("_pick")["_t"])
        .drop("_side", "_rp", "_pick")
    )
