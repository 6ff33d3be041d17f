"""Slowly-changing-dimension Type 2 history from a change stream.

Every lakehouse dimension eventually needs SCD2: instead of
overwriting a key's value (qup1/qup3's latest-per-key merge), each
change OPENS a version row and CLOSES the previous one, producing
(key, value, valid_from, valid_to, is_current) — the shape that lets a
fact row join "the value as of its own timestamp" (an interval/as-of
join against history).

Dataflow: ONE window pass — `lead(ts)` over (key ORDER BY ts,
tiebreak) closes each version with the next version's open time; the
last version per key stays open (valid_to NULL, is_current true).
Single shuffle on the key, no self-join, no driver state; at 100 TB
the window is exactly the per-key sort a merge would have paid anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_cols: list[str],
) -> DataFrame:
    """→ key_cols + value_cols + (valid_from, valid_to, is_current).
    `tiebreak_col` must make (key, ts, tiebreak) unique or version
    order — and therefore which row closes which — is undefined."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    nxt = F.lead(ts_col).over(w)
    return df.select(
        *key_cols,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
