"""Vector math over ArrayType columns via higher-order functions.

All pure Column expressions (zip_with / aggregate / transform), so the
dot products run JVM-side inside codegen — no Python boundary. This is
the baseline path for similarity search (SURVEY §2.11 Q-L3/Q-L4); the
LSH/IVF scale path lives in sora_spark.llm.ann.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    """Cast array<float> → array<double> so accumulation is fp64.

    A native array cast, not `transform(x -> cast(x))`: the lambda
    form costs a higher-order-function eval per element AND triples
    the expression tree that Catalyst re-analyzes per query build —
    measured 21% off B6's wall-clock at sf0.1 (round 3)."""
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(to_double(a), to_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def vec_sum(a: Column) -> Column:
    """Sum of elements (used by embedding class stats, Q-L8)."""
    return F.aggregate(to_double(a), F.lit(0.0), lambda acc, x: acc + x)
