"""One-off measurement (r14, guide §1): selectivity of a degree-capped
2-path prefilter for transitive_edges on the real bench graphs.

A removal edge (a,c) witnessed by 2-path a->b->c requires out(a) >= 2
and in(c) >= 2 except in self-loop corner cases. This probe measures,
for e_co (q10's graph) and the qg20 overlap graph at $SF_DIR:
  |E|, |e1 kept by out(s)>=2|, |e2 kept by in(d)>=2|,
  raw 2-path count vs prefiltered 2-path count (the join probe volume).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from sora_spark.catalog import tables
from sora_spark.graph import e_co
from sora_spark.session import build_session


def probe(name, edges):
    edges = edges.localCheckpoint()
    n_e = edges.count()
    deg = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("s").alias("v"), F.lit(1).alias("o")),
                    F.struct(F.col("d").alias("v"), F.lit(0).alias("o")),
                )
            ).alias("x")
        )
        .groupBy(F.col("x.v").alias("v"))
        .agg(F.sum("x.o").alias("o"), F.sum(1 - F.col("x.o")).alias("i"))
        .localCheckpoint()
    )
    src2 = deg.filter(F.col("o") >= 2).select(F.col("v").alias("s"))
    dst2 = deg.filter(F.col("i") >= 2).select(F.col("v").alias("d"))
    e1k = edges.join(F.broadcast(src2), "s", "left_semi").count()
    e2k = edges.join(F.broadcast(dst2), "d", "left_semi").count()
    # probe volumes: sum over mid b of in(b)*out(b), raw vs filtered
    raw2p = deg.agg(
        F.coalesce(F.sum(F.col("i") * F.col("o")), F.lit(0))
    ).collect()[0][0]
    e1f = edges.join(F.broadcast(src2), "s", "left_semi")
    e2f = edges.join(F.broadcast(dst2), "d", "left_semi")
    degf = (
        e1f.select(F.col("d").alias("v"), F.lit(0).alias("o"))
        .union(e2f.select(F.col("s").alias("v"), F.lit(1).alias("o")))
        .groupBy("v")
        .agg(
            F.sum(1 - F.col("o")).alias("i_out1"),  # e1' edges INTO v
            F.sum("o").alias("o_in2"),              # e2' edges OUT of v
        )
    )
    f2p = degf.agg(
        F.coalesce(F.sum(F.col("i_out1") * F.col("o_in2")), F.lit(0))
    ).collect()[0][0]
    print(
        json.dumps(
            {
                "graph": name,
                "edges": n_e,
                "e1_kept": e1k,
                "e2_kept": e2k,
                "raw_2paths": int(raw2p),
                "filtered_2paths": int(f2p),
            }
        )
    )


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="sora-tred-prefilter-probe")
    spark.sparkContext.setLogLevel("ERROR")
    t = tables(spark, sf_dir)
    t0 = time.time()
    probe("e_co", e_co(t.lineitem))
    print(f"e_co probe {time.time()-t0:.1f}s", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
