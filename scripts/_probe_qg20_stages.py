"""One-off measurement (r14, guide §1): per-stage wall breakdown of
qg20_read_assembly at $SF_DIR (default sf0.1). Noop-sink timing per
stage, warm (second run) after a cold pass.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from sora_spark.catalog import tables
from sora_spark.graph import Graph
from sora_spark.graph.overlap import derive_reads, overlap_edges
from sora_spark.session import build_session


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(sc, label, fn):
    sc.setJobDescription(label)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.3f}s", file=sys.stderr)
    return out, dt


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="sora-qg20-stage-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = tables(spark, sf_dir).documents

    for run in ("cold", "warm"):
        print(f"--- {run} ---", file=sys.stderr)
        reads = derive_reads(docs)
        timed(sc, f"{run}/1 derive_reads noop", lambda: noop(reads))
        ov = overlap_edges(reads)
        timed(sc, f"{run}/2 overlap_edges noop", lambda: noop(ov))
        rstats: dict = {}
        g = Graph(ov)
        red, _ = timed(
            sc,
            f"{run}/3 reduce_pipeline",
            lambda: g.reduce_pipeline(max_iter=10, stats=rstats),
        )
        print(f"  reduce stats: {rstats}", file=sys.stderr)
        astats: dict = {}
        edges, _ = timed(
            sc,
            f"{run}/4 assembly_pipeline (incl reduce rerun)",
            lambda: Graph(ov).assembly_pipeline(max_iter=10, stats=astats),
        )
        print(f"  assembly stats: {astats}", file=sys.stderr)
        ce = Graph(edges).chain_edges()
        timed(
            sc,
            f"{run}/5 chain+compact collect",
            lambda: Graph(ce)
            .compact_chains()
            .select(
                "start", "end", F.col("length").cast("bigint").alias("length")
            )
            .orderBy("start")
            .collect(),
        )
    spark.stop()


if __name__ == "__main__":
    main()
