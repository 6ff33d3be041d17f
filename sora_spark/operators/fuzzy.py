"""Fuzzy (edit-distance bounded) string join.

Scale shape: q-gram blocking — each side explodes into character
q-grams, candidates come from a gram EQUI-join (ordinary shuffle key,
never all-pairs), then `levenshtein() <= max_distance` verifies. By
q-gram count filtering, strings of length >= q·(d+1) within edit
distance d always share at least one q-gram, so recall is exact for
long-enough strings. Strings shorter than q + max_distance all share
ONE dedicated short-string block key: if either side of a
distance-<=d pair is shorter than q, the other is shorter than q+d,
so both land in that bucket and recall stays exact. The short bucket
is quadratic in the COUNT of sub-(q+d)-length strings — fine when
short strings are rare (the normal case); raise q consciously if the
corpus is dominated by very short strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sora_spark.functions.text import char_shingles
from sora_spark.operators._util import suffix_columns


_SHORT_KEY = "\x01short\x01"  # cannot collide with a real q-gram


def _grams(col, q: int, max_distance: int):
    empty = F.expr("CAST(array() AS array<string>)")
    shingles = F.when(F.length(col) >= q, char_shingles(col, q)).otherwise(
        empty
    )
    # every string that COULD pair with a sub-q string joins the one
    # short bucket; strings in [q, q+d) emit both gram kinds
    short = F.when(
        F.length(col) < q + max_distance, F.array(F.lit(_SHORT_KEY))
    ).otherwise(empty)
    return F.concat(shingles, short)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    q: int = 3,
) -> DataFrame:
    """Pairs (left row, right row with columns suffixed `_r`, distance)
    with levenshtein(left_col, right_col) <= max_distance.

    Dedup semantics: the gram join produces one candidate per SHARED
    gram; duplicates are collapsed by full-row dropDuplicates, so the
    output is distinct ROW-VALUE pairs. Rows that are bytewise
    identical collapse too — carry a unique id column on each side
    when row identity matters (then full-row dedup keys on it)."""
    r = suffix_columns(right, "_r")
    right_col_r = right_col + "_r"
    lg = left.withColumn(
        "_g", F.explode(_grams(F.col(left_col), q, max_distance))
    )
    rg = r.withColumn(
        "_g", F.explode(_grams(F.col(right_col_r), q, max_distance))
    )
    cand = lg.join(rg, "_g").drop("_g").dropDuplicates()
    dist = F.levenshtein(F.col(left_col), F.col(right_col_r))
    return cand.withColumn("distance", dist).filter(
        F.col("distance") <= max_distance
    )
