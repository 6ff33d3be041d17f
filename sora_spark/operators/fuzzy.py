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
    """Pairs (left row, right row, distance) with
    levenshtein(left_col, right_col) <= max_distance. Output carries
    all columns of both inputs plus `distance`."""
    lg = left.withColumn("_g", F.explode(_grams(F.col(left_col), q)))
    rg = right.withColumn("_g", F.explode(_grams(F.col(right_col), q)))
    cand = lg.join(rg, "_g").drop("_g").dropDuplicates(
        [left_col, right_col]
    )
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return cand.withColumn("distance", dist).filter(
        F.col("distance") <= max_distance
    )
