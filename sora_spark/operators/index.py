"""Contiguous global row indexing without a global sort bottleneck.

`row_number() OVER (ORDER BY ...)` with no PARTITION BY plans a
single-partition window — the whole dataset funnels through one task,
the canonical 100 TB failure. `monotonically_increasing_id` is
distributed but neither contiguous nor order-respecting. This module
implements the standard two-pass fix: range-partition on the order
key, count rows per partition (a partition-count-sized driver
aggregate), broadcast the running offsets, and add them to the
partition-local row_number — every pass fully parallel, the only
driver data being one count per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = "row_index",
    num_partitions: int | None = None,
) -> DataFrame:
    """→ df + `index_col`: contiguous 1-based global rank under the
    TOTAL order `order_cols` (callers must include a unique tiebreak
    column — with ties, range partitioning may split equal keys
    across partitions and their relative index order would be
    arbitrary, exactly like nondeterministic row_number ties).

    Two passes, no global funnel:
    1. `repartitionByRange(order_cols)` + in-partition sort — Spark's
       sampled range partitioner guarantees partition p's keys all
       precede partition p+1's.
    2. One groupBy(spark_partition_id) count → driver (one row per
       partition) → cumulative offsets broadcast back as a literal
       CASE map; final index = partition-local row_number + offset.

    The in-partition window repartitions nothing (it keys on the
    partition id the range exchange just produced), so total cost is
    ONE range exchange + one map pass — vs the single-partition
    global window, which is a non-starter past one executor's memory.
    """
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions is not None
        else df.repartitionByRange(*order_cols)
    )
    parted = parted.withColumn("_pid", F.spark_partition_id())
    # cache so the count pass and the final pass see the SAME sampled
    # range boundaries (re-evaluating repartitionByRange could re-
    # sample different boundaries — counts would no longer line up)
    parted = parted.localCheckpoint(eager=True)
    counts = sorted(
        (r["_pid"], r["n"])
        for r in parted.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    # offset lookup as a single CASE chain (partition-count sized —
    # fine for any realistic partition count)
    case = None
    for pid, off in offsets.items():
        case = (
            F.when(F.col("_pid") == pid, F.lit(off))
            if case is None
            else case.when(F.col("_pid") == pid, F.lit(off))
        )
    case = F.lit(0) if case is None else case.otherwise(F.lit(0))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        parted.withColumn(
            index_col, (F.row_number().over(w) + case).cast("bigint")
        )
        .drop("_pid")
    )
