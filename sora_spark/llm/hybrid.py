"""Hybrid retrieval: fuse lexical (BM25 postings index) and vector
(IVF index) rankings with Reciprocal Rank Fusion — the standard
first-stage retrieval shape of a RAG/training-data pipeline, and the
operation that JOINS this repo's two on-disk index subsystems
(llm/textindex.py, llm/ann.py) into one serving path.

RRF (Cormack/Clarke/Buettcher 2009): score(d) = Σ_systems 1/(k + r_d)
with k=60 — rank-based, so the two systems' incomparable score scales
(BM25 logs vs cosine) never need calibration, which is exactly why
production hybrid search defaults to it.

Scale posture: each side's candidate list is top-k SMALL by contract
(the expensive work — bucket-pruned postings scan, partition-pruned
inverted-list probe — already happened inside the index paths), so the
fusion is a full-outer join of two k-row frames: broadcast-sized by
construction, zero extra passes over any corpus. Ranks are made
deterministic by each side's (score desc, id) total order, so the
fused output is hash-stable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    text_hits: DataFrame,
    vec_hits: DataFrame,
    k_rrf: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Fuse two ranked candidate lists into (id, rrf, text_rank,
    vec_rank), rrf desc / id tiebreak.

    `text_hits`: (doc_id, score) — ranked here by (score desc, doc_id)
    so already-rounded scores give deterministic ranks.
    `vec_hits`: (neighbor_id, rn) — the ANN contract's rank column
    (ivf_topk_indexed / brute_force_topk emit rn directly).

    Absent-in-one-system candidates contribute 0 from that system
    (the standard RRF convention). The single-partition rank window
    over text_hits is bounded by its top-k size, never the corpus.

    Fusion shape: UNION + groupBy, not an outer join — Spark cannot
    broadcast a full-outer join (it would plan a shuffle SortMergeJoin
    even for two k-row lists; caught by the qix14 plan pin), while the
    union aggregates the same 2k rows in one tiny hash agg. Per-id
    contribution order is immaterial (IEEE addition of two terms is
    commutative), so the fused scores stay hash-deterministic."""
    tw = Window.orderBy(F.desc("score"), F.col("doc_id"))
    t = text_hits.select(
        F.col("doc_id").alias("id"),
        F.row_number().over(tw).alias("text_rank"),
        F.lit(None).cast("int").alias("vec_rank"),
    )
    v = vec_hits.select(
        F.col("neighbor_id").alias("id"),
        F.lit(None).cast("int").alias("text_rank"),
        F.col("rn").cast("int").alias("vec_rank"),
    )
    u = t.unionByName(v).withColumn(
        "contrib",
        F.coalesce(
            F.lit(1.0) / (F.lit(k_rrf) + F.col("text_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(k_rrf) + F.col("vec_rank")), F.lit(0.0)
        ),
    )
    return (
        u.groupBy("id")
        .agg(
            F.round(F.sum("contrib"), round_to).alias("rrf"),
            F.max("text_rank").alias("text_rank"),
            F.max("vec_rank").alias("vec_rank"),
        )
        .orderBy(F.desc("rrf"), "id")
    )
