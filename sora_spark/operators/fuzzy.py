"""Fuzzy (edit-distance bounded) string join.

Scale shape: q-gram blocking — each side explodes into character
q-grams, candidates come from a gram EQUI-join (ordinary shuffle key,
never all-pairs), then `levenshtein() <= max_distance` verifies. By
q-gram count filtering, strings of length >= q·(d+1) within edit
distance d always share at least one q-gram, so recall is exact for
long-enough strings; shorter strings fall back to their whole text as
a single gram (exact-prefix recall only — documented, not hidden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sora_spark.functions.text import char_shingles
from sora_spark.operators._util import suffix_columns


def _grams(col, q: int):
    return F.when(
        F.length(col) >= q, char_shingles(col, q)
    ).otherwise(F.array(col))


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
    lg = left.withColumn("_g", F.explode(_grams(F.col(left_col), q)))
    rg = r.withColumn("_g", F.explode(_grams(F.col(right_col_r), q)))
    cand = lg.join(rg, "_g").drop("_g").dropDuplicates()
    dist = F.levenshtein(F.col(left_col), F.col(right_col_r))
    return cand.withColumn("distance", dist).filter(
        F.col("distance") <= max_distance
    )
