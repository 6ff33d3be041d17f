"""Skew mitigation helpers (SURVEY §4.2 '100 TB posture').

AQE's skew-join splitting handles most cases at runtime; `salted_join`
is the explicit fallback for pathological hot keys (one key holding a
double-digit percentage of a 100 TB fact table): the big side scatters
each row to one of `n_salts` sub-keys, the small side replicates
`n_salts`×, and the hot key's work spreads over `n_salts` reducers.

Aggregation skew needs no helper — Spark's partial HashAggregate
already combines map-side (pinned by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Row→salt assignment uses rand(); ANY assignment yields the same
    join result (each big row still meets every copy of its key), so
    retry nondeterminism is harmless.

    Only big-side-preserving join types are supported: with 'right' or
    'full', each unmatched small-side row would surface once PER SALT
    REPLICA (n_salts null-extended duplicates), so those are rejected.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
               "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — small-side replication"
            " duplicates unmatched rows under right/full joins"
        )
    big_s = big.withColumn(
        "_salt", F.floor(F.rand(7) * n_salts).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = big_s.join(
        small_s,
        (F.col(big_key) == F.col(small_key)) & (big_s["_salt"] == small_s["_salt"]),
        how,
    )
    return joined.drop("_salt")
