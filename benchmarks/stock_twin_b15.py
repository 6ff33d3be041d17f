"""B15 stock-PySpark twin: exact cosine top-10 neighbor scan for the
B15 probe set (every 10th embedding, 200 probes at sf0.1) — the query
a stock PySpark user runs when no ANN index exists: broadcast the
probes, score EVERY corpus vector against every probe with the
F.aggregate dot-product HOF, window top-k per probe. This is the full
O(|corpus| x |probes| x dim) scan the IVF index exists to avoid.

B15 is the one baseline pair that is deliberately NOT output-identical:
the engine side (bench.py q15, `ivf_topk_indexed` over a
`write_ivf_index` layout, n_probe=8/16) is approximate by design, and
the quality delta is REPORTED AND GATED in the bench row itself
(recall@10 vs this twin's exact answer, floor 0.70 — the calibrated
value for a 50% scan fraction on the fixture corpus, whose vectors are
measured isotropic-random: intra-label and inter-label mean cosine are
both ~1e-5, so no ANN partitioning can beat the scan fraction by much
here; see tests/test_llm.py::test_ivf_clustered_recall for the >=0.9
recall gate on a corpus where cluster structure actually exists).

Methodology otherwise mirrors BASELINE.md's B10-B14 twins: stock
session conf (shuffle.partitions=8, AQE defaults, no engine imports),
1 cold + 3 warm runs, median warm is the baseline column; budget = 2x.

Run:  python benchmarks/stock_twin_b15.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

K = 10


def exact_topk(spark: SparkSession, sf_dir: str):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    dot = F.aggregate(
        F.zip_with("pv", "cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    sim = F.round(dot / (norm(F.col("pv")) * norm(F.col("cv"))), 5)
    j = corpus.join(F.broadcast(probes)).filter(
        F.col("neighbor_id") != F.col("probe_id")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        j.select("probe_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("probe_id", "rn", "neighbor_id", "sim")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("stock-b15-twin")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        exact_topk(spark, sf_dir).collect()
        times.append(time.perf_counter() - t0)
        print(f"[stock-b15] run{i}: {times[-1]:.3f}s", file=sys.stderr)
    print(
        f"[stock-b15] cold={times[0]:.3f}s "
        f"warm_median={statistics.median(times[1:]):.3f}s sf_dir={sf_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
