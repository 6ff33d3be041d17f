"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def suffix_columns(df: DataFrame, suffix: str) -> DataFrame:
    """Rename every column with `suffix`, refusing collisions (a frame
    already containing both 'a' and 'a<suffix>' would double-rename
    into ambiguity)."""
    existing = set(df.columns)
    for c in df.columns:
        if c + suffix in existing:
            raise ValueError(
                f"suffix_columns: renaming {c!r} to {c + suffix!r} collides"
                " with an existing column — drop or rename it first"
            )
    out = df
    for c in df.columns:
        out = out.withColumnRenamed(c, c + suffix)
    return out
