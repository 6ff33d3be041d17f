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
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    tiebreak_col: str,
    right_value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """Left rows + `out_col` = right's `right_value_col` at the latest
    strictly-earlier (time_col, tiebreak_col) for the same `key`.

    Both frames must share key/time/tiebreak column names; right rows
    only contribute `right_value_col`. Left rows with no earlier right
    row get NULL.
    """
    lt = left.withColumn("_side", F.lit(0))
    rv_type = right.schema[right_value_col].dataType
    lt = lt.withColumn("_rv", F.lit(None).cast(rv_type))
    rt = right.select(
        key, time_col, tiebreak_col, F.col(right_value_col).alias("_rv")
    ).withColumn("_side", F.lit(1))
    # Left may carry arbitrary payload columns; pad the right side with
    # typed NULLs so the union resolves for any left schema.
    shared = {key, time_col, tiebreak_col, "_rv", "_side"}
    for f_ in left.schema.fields:
        if f_.name not in shared:
            rt = rt.withColumn(f_.name, F.lit(None).cast(f_.dataType))
    unioned = lt.unionByName(rt.select(*lt.columns))
    # Left rows sort BEFORE right rows at equal time (side 0 < 1), so the
    # preceding frame for a left row holds exactly the strictly-earlier
    # right rows; `last` over it is the latest such value (max would be
    # wrong for any non-monotone right value, e.g. a price).
    w = (
        Window.partitionBy(key)
        .orderBy(time_col, "_side", tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        unioned.withColumn(out_col, F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 0)
        .drop("_side", "_rv")
    )
