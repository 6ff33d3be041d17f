"""Multimodal columns (SURVEY §1.1/§2.11): image/audio/video payloads
as opaque BinaryType columns + typed StructType metadata, with decode/
feature-extraction as Arrow-batched mapInPandas stages.

The container has no image/audio libraries, so the DECODE step is a
deterministic stub (first bytes → fake feature vector) clearly marked
below; everything around it — schema, batch iteration, partitioning,
UDF signatures — is the real Spark plumbing a production decoder would
drop into (swap `_fake_decode` for PIL/ffmpeg and nothing else moves).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata struct carried beside every payload column
MEDIA_META_SCHEMA = "mime string, n_bytes int, checksum string"


def attach_payload(
    df: DataFrame, src_col: str, mime: str, payload_col: str = "payload"
) -> DataFrame:
    """Encode a string column as a binary payload + metadata struct
    (fixtures ship no binary column, so media payloads are derived —
    the column types and plumbing are what's under test)."""
    payload = F.encode(F.col(src_col), "UTF-8")
    return df.withColumn(payload_col, payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.md5(F.col(src_col)).alias("checksum"),
        ),
    )


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    # STUB: deterministic stand-in for an image/audio decoder — real
    # decoding libraries are not available in this container. Features
    # are the first n bytes, zero-padded, scaled to [0, 1).
    head = payload[:n_features]
    vals = list(head) + [0] * (n_features - len(head))
    return [v / 256.0 for v in vals]


def extract_features(
    df: DataFrame, payload_col: str = "payload", n_features: int = 8
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one feature
    vector per payload out. Keyless map-side work — no shuffle; at
    100 TB this scales with input splits alone."""
    out_schema = "doc_id bigint, features array<double>"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": [
                        _fake_decode(p, n_features) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(decode_batches, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = 16,
    stride: int = 32,
) -> DataFrame:
    """Video-style frame sampling: every `stride` bytes, slice a
    `frame_bytes` window out of the payload → (doc_id, frame_idx,
    frame) rows. The slicing is pure JVM expressions (sequence +
    posexplode + substring on binary) — whole-stage codegen, no Python,
    no shuffle; a real decoder then runs per-frame via
    `extract_features`-style mapInPandas. Payloads shorter than one
    frame yield no rows (same strictness as the shingle operators)."""
    n = F.octet_length(F.col(payload_col))
    offsets = F.when(
        n >= frame_bytes,
        F.sequence(F.lit(1), n - frame_bytes + 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select("doc_id", payload_col, F.posexplode(offsets).alias("frame_idx", "_off"))
        .select(
            "doc_id",
            "frame_idx",
            F.substring(F.col(payload_col), F.col("_off"), frame_bytes).alias(
                "frame"
            ),
        )
    )


def stride_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    stride: int = 4,
) -> DataFrame:
    """Hash-gateable slice of the Python decode path: per payload, the
    byte count and the mean of every `stride`-th byte — computed in a
    REAL mapInPandas stage (numpy over Arrow batches, the exact shape
    `extract_features`' stubbed decoder runs in), but on arithmetic a
    SQL oracle can reproduce from the source text (fixtures are ASCII,
    so byte k == ascii(char k)). This puts the multimodal Python
    plumbing itself — Arrow binary transfer, batch iteration, per-row
    ndarray work — behind the cross-engine hash gate, which the
    opaque fake-feature stub cannot be."""
    import numpy as np

    out_schema = f"{id_col} bigint, n_bytes int, mean_stride double"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            means = []
            sizes = []
            for b in pdf[payload_col]:
                a = np.frombuffer(b, dtype=np.uint8)[::stride]
                means.append(float(a.mean()))
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": sizes,
                    "mean_stride": means,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)
