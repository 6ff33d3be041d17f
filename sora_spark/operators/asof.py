"""As-of (event-time) join: for each left row, the most recent
right row with right.time strictly earlier, per key (SURVEY Q-J8).

Implemented as union + window rather than a range join: tagging both
sides and running one `max(when(right)) OVER (ROWS … 1 PRECEDING)`
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
    only contribute `right_value_col`.
    """
    lt = left.withColumn("_side", F.lit(0))
    rt = right.select(
        key, time_col, tiebreak_col, F.col(right_value_col).alias("_rv")
    ).withColumn("_side", F.lit(1))
    lt = lt.withColumn("_rv", F.lit(None).cast(rt.schema["_rv"].dataType))
    unioned = lt.unionByName(rt.select(*lt.columns))
    # Right rows sort AFTER left rows at equal time ⇒ a preceding right
    # row is strictly earlier under (time, side, tiebreak).
    w = (
        Window.partitionBy(key)
        .orderBy(time_col, "_side", tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        unioned.withColumn(out_col, F.max("_rv").over(w))
        .filter(F.col("_side") == 1)
        .drop("_side", "_rv")
    )
