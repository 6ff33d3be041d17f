"""Z-order (Morton) data layout for multi-dimensional data skipping.

Parquet min/max pruning works per file: a filter on a column skips a
file only if the file's [min, max] for that column excludes the
predicate. Sorting by ONE column gives perfect skipping on it and none
on the second; interleaving the bits of two key columns (the Z-value)
gives both columns locality in the SAME linear order, so
`repartitionByRange(zvalue).sortWithinPartitions(zvalue)` + parquet
write yields files whose min/max boxes are tight in BOTH dimensions —
the standard lakehouse layout trick for two-predicate scan pruning at
100 TB (cf. the public Delta/Iceberg Z-ORDER feature).

The interleave is pure integer arithmetic (shift/mask/or), generated
once per bit position and rendered for both engines so the declared
query's oracle is the same formula by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_terms(x: str, y: str, bits: int) -> list[tuple[str, int, int]]:
    """(source_col, src_bit, dst_bit) for the interleave: x bits land
    on even positions, y bits on odd."""
    terms = []
    for i in range(bits):
        terms.append((x, i, 2 * i))
        terms.append((y, i, 2 * i + 1))
    return terms


def zvalue(x: str, y: str, bits: int = 8) -> Column:
    """Morton interleave of the low `bits` of two non-negative int
    columns (caller buckets/offsets beforehand — standard Z-order
    practice; 8+8 bits covers 256x256 range boxes, plenty for file-
    level skipping)."""
    out = F.lit(0).cast("long")
    for col, src, dst in _bit_terms(x, y, bits):
        out = out + F.shiftleft(
            F.shiftright(F.col(col).cast("long"), src).bitwiseAND(1), dst
        )
    return out


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """The SAME interleave as DuckDB SQL text (operators, not Spark
    function names) — oracle parity by construction."""
    parts = [
        f"((({col} >> {src}) & 1) << {dst})"
        for col, src, dst in _bit_terms(x, y, bits)
    ]
    return " + ".join(parts)


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write `df` as parquet laid out in Z-order over (x, y): range-
    partition on the Z-value (one shuffle, AQE-sized ranges), sort
    within partitions (no extra exchange), drop the helper column.
    Readers filtering on x or y then skip whole files via row-group
    min/max — no engine cooperation needed beyond plain parquet."""
    (
        df.withColumn("_z", zvalue(x, y, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def _bit_terms_n(cols: list[str], bits: int):
    """(col, src_bit, dst_bit) for an N-way Morton interleave —
    round-robin across columns, low bits first, so every column's
    low-order locality lands in the z-value's low-order bits."""
    n = len(cols)
    return [
        (c, i, i * n + j)
        for i in range(bits)
        for j, c in enumerate(cols)
    ]


def zvalue_n(cols: list[str], bits: int = 8) -> Column:
    """N-dimensional Morton interleave of the low `bits` of each
    non-negative int column (caller normalizes beforehand, like
    zvalue). bits*len(cols) must fit a signed 64-bit value — 8 bits
    across up to 7 columns; the 2-column case reproduces zvalue's
    layout exactly (same round-robin, so the qup22 plans are
    unchanged under the general path)."""
    if not cols:
        raise ValueError("zvalue_n needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} columns x {bits} bits exceeds a 64-bit "
            "z-value; lower bits="
        )
    out = F.lit(0).cast("long")
    for col, src, dst in _bit_terms_n(cols, bits):
        out = out + F.shiftleft(
            F.shiftright(F.col(col).cast("long"), src).bitwiseAND(1), dst
        )
    return out
