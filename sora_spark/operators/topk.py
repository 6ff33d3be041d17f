"""Top-k per group with a map-side combiner.

The plain window form (`row_number() OVER (PARTITION BY g ORDER BY v)`
then `rn <= k`) shuffles EVERY row to the group's reducer. For small k
and many rows per group, almost all of that shuffle is waste. Here a
`mapInPandas` partial pass keeps at most k rows per (group, Arrow
batch) — a superset of each partition's true top-k, since the global
top-k rows of a group each survive whatever batch they sit in — and
only that reduced stream shuffles into the exact window pass.
Shuffle volume drops from |rows| to ≲ k · groups · batches.

Ties on `order_col` are broken by `tiebreak_cols` (required — without
a total order, "top-k" is not well-defined and the partial pass could
legally disagree with the final pass).

MEASURED trade (local[32], 4.8M rows, 3 groups, k=5): window 5.8 s vs
combiner 6.8 s — on a single machine the shuffle is nearly free and
the Arrow transit through Python dominates, so the combiner LOSES
locally. It pays where shuffle crosses a network: volume drops
~1000× here (4.8M rows → k·groups·batches), which is the binding cost
on a real cluster. Use the plain window form on local/colocated data."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str],
    descending: bool = True,
) -> DataFrame:
    """Rows of the top-k per group, with `rn` (1-based rank)."""
    if "rn" in df.columns:
        # withColumn("rn", ...) would silently replace the caller's
        # column (same guard as the salted variant)
        raise ValueError(
            "topk_per_group: input already has `rn`; rename before "
            "calling (the operator emits `rn`)"
        )
    sort_cols = [order_col, *tiebreak_cols]
    ascending = [not descending] + [True] * len(tiebreak_cols)

    # pandas mirrors of Spark's NULL ordering: desc == NULLS LAST,
    # asc == NULLS FIRST (review finding — pandas defaults to NaN last
    # in both directions and drops NaN group keys entirely).
    # Tiebreak columns are assumed non-null (they define the total
    # order; a null tiebreak makes "top-k" ill-defined anyway).
    na_pos = "last" if descending else "first"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        sort_cols, ascending=ascending, na_position=na_pos
                    )
                    .groupby(group_cols, sort=False, dropna=False)
                    .head(k)
                )

    reduced = df.mapInPandas(partial, df.schema)
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        *[F.col(c).asc() for c in tiebreak_cols],
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        reduced.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def topk_per_group_salted(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str],
    descending: bool = True,
    n_salts: int = 32,
) -> DataFrame:
    """Skew-proof top-k per group, pure JVM: phase 1 ranks within
    (group, salt) — so `n_salts` reducers SHARE each hot group — and
    keeps k rows per salted bucket; phase 2's exact per-group window
    then sees at most k·n_salts rows per group REGARDLESS of the
    group's input size. Same result as the plain window (each global
    top-k row is necessarily top-k within its own salt bucket; both
    phases use the identical total order, so ranks are exact).

    This is the window-skew remedy AQE does not provide: adaptive
    execution splits skewed JOIN partitions but a skewed
    row_number() partition still lands on one task. With an organic
    1.5%-hot key (gen_organic sf1.0), one task owns ~27k of 1.5M
    orders under the plain window; here it owns ≤ k·n_salts rows.
    The extra exchange costs ~20-30% on unskewed local data — use the
    plain window until a group exceeds what one task should sort
    (the same trade as topk_per_group's Arrow combiner, but staying
    JVM-side: no Python transit, so it beats the combiner whenever
    whole-row Arrow serialization dominates — measured in SCALE.md
    round 10)."""
    clash = {"_salt", "_prn", "rn"} & set(df.columns)
    if clash:
        # withColumn would silently REPLACE (and drop then remove) a
        # caller column of the same name — fail loudly instead
        raise ValueError(
            f"topk_per_group_salted: input already has {sorted(clash)}; "
            "rename before calling (the operator emits `rn` and uses "
            "_salt/_prn internally)"
        )
    salt = F.pmod(
        F.hash(*[F.col(c) for c in tiebreak_cols]), F.lit(n_salts)
    )
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        *[F.col(c).asc() for c in tiebreak_cols],
    ]
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    reduced = (
        df.withColumn("_salt", salt)
        .withColumn("_prn", F.row_number().over(w1))
        .filter(F.col("_prn") <= k)
        .drop("_salt", "_prn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        reduced.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
    )
