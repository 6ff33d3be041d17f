"""B12 stock-PySpark twin: the end-to-end fuzzy-dedup clustering
pipeline (qd5) written the way a stock PySpark user would — same
algorithm classes (word-3-gram shingles, 4-perm MinHash, 2-band LSH
candidate pairs, connected components over the pair graph, canonical
per cluster), but none of the engine's optimizations:

- components via the naive one-phase min-label propagation loop
  (labels flood one hop per round, O(diameter) rounds with a
  changed-row count() barrier each) instead of the engine's two-phase
  large-star/small-star contraction with its hash-signature
  convergence screen;
- plain `localCheckpoint()` per round, no eager release management;
- no broadcast gating anywhere (AQE decides);
- candidate pairs re-derived from scratch (no fingerprint reuse).

Methodology mirrors BASELINE.md's B10/B11 twins: stock session conf
(shuffle.partitions=8, AQE defaults, no engine code imported), 1 cold
+ 3 warm runs, median warm is the baseline column; budget = 2x that.
Output is verified identical to the engine's qd5 rows before timing
(same (doc_id, cluster_id, is_canonical) set), so the twin measures
the same computation, not a lighter one.

Run:  python benchmarks/stock_twin_b12.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

NUM_PERM, BANDS = 4, 2


def cluster(spark: SparkSession, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    sh = (
        w.filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 2), "
                    "i -> concat_ws(' ', element_at(w, i), "
                    "element_at(w, i + 1), element_at(w, i + 2)))"
                )
            ).alias("sh"),
        )
    )
    perms = spark.range(NUM_PERM).select(F.col("id").alias("perm"))
    sig = (
        sh.crossJoin(perms)
        .groupBy("doc_id", "perm")
        .agg(
            F.min(
                F.md5(F.concat(F.col("perm").cast("string"), F.lit("|"), "sh"))
            ).alias("sig")
        )
    )
    bands = sig.groupBy(
        "doc_id", (F.col("perm") / (NUM_PERM // BANDS)).cast("int").alias("band")
    ).agg(
        F.array_join(F.array_sort(F.collect_list("sig")), "|").alias("bkey")
    )
    a = bands.select(
        F.col("doc_id").alias("a"), "band", F.col("bkey").alias("ka")
    )
    b = bands.select(
        F.col("doc_id").alias("b"), "band", F.col("bkey").alias("kb")
    )
    pairs = (
        a.join(b, (a.band == b.band) & (a.ka == b.kb) & (a.a < b.b))
        .select("a", "b")
        .distinct()
    )
    edges = pairs.select(
        F.col("a").alias("s"), F.col("b").alias("d")
    ).union(pairs.select(F.col("b").alias("s"), F.col("a").alias("d")))
    # naive min-label propagation: O(diameter) rounds, count() barrier
    labels = docs.select(
        "doc_id", F.col("doc_id").alias("label")
    ).localCheckpoint(eager=True)
    while True:
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("d"), F.col("label").alias("nl")
                ),
                "d",
            )
            .groupBy("s")
            .agg(F.min("nl").alias("nl"))
        )
        new = (
            labels.join(
                nbr_min, labels.doc_id == nbr_min.s, "left"
            )
            .select(
                "doc_id",
                F.least(
                    "label", F.coalesce("nl", F.col("label"))
                ).alias("label"),
                (F.coalesce("nl", F.col("label")) < F.col("label")).alias(
                    "_chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.filter(F.col("_chg")).count()
        labels = new.drop("_chg")
        if changed == 0:
            break
    out = labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (
            F.row_number().over(
                Window.partitionBy("label").orderBy("doc_id")
            )
            == 1
        ).alias("is_canonical"),
    )
    return out.orderBy("doc_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("stock-b12-twin")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        cluster(spark, sf_dir).collect()
        times.append(time.perf_counter() - t0)
        print(f"[stock-b12] run{i}: {times[-1]:.3f}s", file=sys.stderr)
    print(
        f"[stock-b12] cold={times[0]:.3f}s "
        f"warm_median={statistics.median(times[1:]):.3f}s sf_dir={sf_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
