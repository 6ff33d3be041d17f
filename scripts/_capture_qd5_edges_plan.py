"""Standalone plan capture for qd5's cluster-edge derivation (r15):
the committed qd5 plan files start at the checkpointed pair RDD, so
the edge derivation — the part the star rewrite changes — is
snapshotted here, checkpoint neutralized.

before = lsh_candidate_pairs' clique self-join (k(k-1)/2 pairs per
bucket, broadcast build side); after = near_dup_clusters' per-bucket
star edges (k-1 rows per bucket, one hash exchange, no broadcast).

Usage: python scripts/_capture_qd5_edges_plan.py
Writes plans/r15/qd5_edges_{before,after}.txt. Plan capture only
analyzes/optimizes — no job runs.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sora_spark.catalog import tables
    from sora_spark.llm import dedup
    from sora_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="sora-qd5-edges-plan")
    spark.sparkContext.setLogLevel("ERROR")
    docs = tables(spark, sf_dir).documents

    bk = dedup._band_keys(docs, "text", "doc_id", 8, 4)
    a, b = bk.alias("a"), bk.alias("b")
    before = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("s"), F.col("b.id").alias("d"))
        .distinct()
    )
    w_b = Window.partitionBy("band", "bkey")
    after = (
        bk.withColumn("root", F.min("id").over(w_b))
        .filter(F.col("id") != F.col("root"))
        .select(F.col("root").alias("s"), F.col("id").alias("d"))
        .distinct()
    )
    for name, df in (("before", before), ("after", after)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"qd5_edges_{name}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
