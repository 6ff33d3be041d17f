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


def int8_scale(a: Column) -> Column:
    """Per-vector symmetric int8 scale: max(|x|)/127 (0.0 for the
    all-zero vector; quantize_int8 special-cases it)."""
    return F.array_max(F.transform(to_double(a), lambda x: F.abs(x))) / F.lit(
        127.0
    )


def quantize_int8(a: Column, scale: Column) -> Column:
    """Symmetric scalar int8 quantization: q_i = floor(x_i/scale + 0.5)
    (explicit floor(+0.5), NOT round(): both engines then evaluate the
    identical double expression, so half-way ties can't diverge on
    rounding mode). The 4x memory cut is the point: at 100 TB of
    embeddings the int8 copy is what a first-pass ANN scan reads,
    with exact re-scoring only on survivors."""
    return F.when(
        scale == 0, F.transform(to_double(a), lambda x: F.lit(0).cast("bigint"))
    ).otherwise(
        F.transform(to_double(a), lambda x: F.floor(x / scale + F.lit(0.5)))
    )


def dequant_mse(a: Column, q: Column, scale: Column) -> Column:
    """Mean squared reconstruction error of the quantized vector."""
    sq = F.zip_with(
        to_double(a), q, lambda x, qv: (x - qv * scale) * (x - qv * scale)
    )
    return F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x) / F.size(q)
