"""B13 stock-PySpark twin: the de Bruijn unitig pipeline (qg45)
written the way a stock PySpark user would — same algorithm classes
(12-mer window edges, degree-filtered chain subgraph, start-anchored
chain compaction), but none of the engine's optimizations:

- compaction via the naive ONE-STEP walk (each round extends every
  open chain by a single edge, O(longest-chain) rounds with a count()
  barrier per round) instead of the engine's pointer doubling
  (O(log L) rounds — the Graph.compact_chains path);
- plain `localCheckpoint()` per round, no eager release management;
- no broadcast gating anywhere (AQE decides).

Methodology mirrors BASELINE.md's B10/B11/B12 twins: stock session
conf (shuffle.partitions=8, AQE defaults, no engine code imported),
1 cold + 3 warm runs, median warm is the baseline column; budget =
2x that. Output is verified identical to the engine's qg45 rows
before timing (same (start, end, length) set), so the twin measures
the same computation, not a lighter one.

Run:  python benchmarks/stock_twin_b13.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

K = 12


def unitigs(spark: SparkSession, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "text", "n_chars"
    )
    win = F.expr(
        f"transform(sequence(1, cast(n_chars - {K} as int)), "
        f"i -> struct(substring(text, i, {K}) as s, "
        f"substring(text, i + 1, {K}) as d))"
    )
    e = (
        docs.filter(F.col("n_chars") >= K + 1)
        .select(F.explode(win).alias("e"))
        .select("e.s", "e.d")
        .distinct()
        .localCheckpoint()
    )
    out1 = (
        e.groupBy("s").agg(F.count("*").alias("c"))
        .filter(F.col("c") == 1)
        .select("s")
    )
    in1 = (
        e.groupBy("d").agg(F.count("*").alias("c"))
        .filter(F.col("c") == 1)
        .select("d")
    )
    ce = (
        e.join(out1, "s", "left_semi")
        .join(in1, "d", "left_semi")
        .select("s", "d")
        .localCheckpoint()
    )
    starts = ce.select("s").subtract(ce.select(F.col("d").alias("s")))
    # naive one-step walk: extend every open chain by one edge per round
    active = (
        ce.join(starts, "s", "left_semi")
        .select(
            F.col("s").alias("start"),
            F.col("d").alias("v"),
            F.lit(1).alias("len"),
        )
        .localCheckpoint()
    )
    done = None
    for _ in range(200):
        nxt = ce.select(F.col("s").alias("v"), F.col("d").alias("nd"))
        j = active.join(nxt, "v", "left").localCheckpoint()
        finished = j.filter(F.col("nd").isNull()).select(
            "start", F.col("v").alias("end"), F.col("len").alias("length")
        )
        done = finished if done is None else done.unionByName(finished)
        done = done.localCheckpoint()
        active = (
            j.filter(F.col("nd").isNotNull())
            .select(
                "start",
                F.col("nd").alias("v"),
                (F.col("len") + 1).alias("len"),
            )
            .localCheckpoint()
        )
        if active.count() == 0:
            break
    else:
        raise RuntimeError("stock twin walk did not terminate")
    return done.orderBy("start").limit(5000)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("stock-twin-b13")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    for i in range(4):
        t0 = time.time()
        n = unitigs(spark, sf_dir).count()
        times.append(time.time() - t0)
        print(
            f"[stock-twin-b13] run {i}: {times[-1]:.3f}s rows={n}",
            file=sys.stderr,
        )
    warm = statistics.median(times[1:])
    print(
        f'{{"twin": "b13", "cold": {times[0]:.3f}, "warm": {warm:.4f}, '
        f'"sf_dir": "{sf_dir}"}}'
    )


if __name__ == "__main__":
    main()
