"""B11 stock-PySpark twin: the read-assembly pipeline (qg20) written
the way a stock PySpark user would — same algorithm classes (k-mer
keyed overlap join, alternating transitive-reduction/tip-trim fixpoint,
bubble-pop fixpoint, single-step chain walking), but none of the
engine's optimizations:

- plain `localCheckpoint()` per round, the canonical public-API fix any
  stock user needs once an iterative loop's logical plan grows
  multiplicatively (a cache()-only variant OOMs the driver on plan
  trees before it ever recomputes anything — verified here), but NO
  eager block release management between rounds;
- the 2-path transitive join re-runs EVERY round (no round-1-only
  invariant);
- no broadcast gating of removal/tip sets (Spark/AQE decides);
- unitig compaction walks chains ONE step per round (O(longest chain)
  shuffles) instead of pointer doubling (O(log)).

Methodology mirrors BASELINE.md's B10 twin: stock session conf
(shuffle.partitions=8, AQE defaults, no engine code imported), 1 cold +
3 warm runs, median warm is the baseline column; budget = 2x that.
Output is verified identical to the engine's qg20 rows before timing
(same (start, end, length) set), so the twin measures the same
computation, not a lighter one.

Run:  python benchmarks/stock_twin_b11.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

READ_LEN, STRIDE, MIN_OVL = 40, 20, 20
HUB_DEGREE, MIN_MIDS, MAX_ITER = 3, 2, 10


def assemble(spark: SparkSession, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reads = (
        docs.filter(F.col("n_chars") >= READ_LEN)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(
                        (F.col("n_chars") - READ_LEN) / STRIDE
                    ).cast("int"),
                )
            ).alias("i"),
        )
        .select(
            (F.col("doc_id") * 1000 + F.col("i")).alias("read_id"),
            F.col("text")
            .substr(F.col("i") * STRIDE + F.lit(1), F.lit(READ_LEN))
            .alias("seq"),
        )
    )
    sfx = reads.select(
        F.col("read_id").alias("s"),
        F.col("seq")
        .substr(F.lit(READ_LEN - MIN_OVL + 1), F.lit(MIN_OVL))
        .alias("k"),
    )
    pfx = reads.select(
        F.col("read_id").alias("d"),
        F.col("seq").substr(F.lit(1), F.lit(MIN_OVL)).alias("k"),
    )
    edges = (
        sfx.join(pfx, "k").filter("s != d").select("s", "d").localCheckpoint(eager=True)
    )
    prev = edges.count()

    # stage 1: transitive reduction + tip trim, alternating to fixpoint
    for _ in range(MAX_ITER):
        e1, e2 = edges.alias("e1"), edges.alias("e2")
        two = (
            e1.join(e2, F.col("e1.d") == F.col("e2.s"))
            .select(F.col("e1.s").alias("s"), F.col("e2.d").alias("d"))
            .distinct()
        )
        reduced = edges.join(two, ["s", "d"], "left_anti")
        ends = reduced.select(
            F.col("s").alias("v"), F.col("d").alias("nbr")
        ).union(
            reduced.select(F.col("d").alias("v"), F.col("s").alias("nbr"))
        )
        deg = ends.groupBy("v").agg(F.count("*").alias("degree"))
        d1 = deg.filter(F.col("degree") == 1).select("v")
        hub = deg.filter(F.col("degree") >= HUB_DEGREE).select(
            F.col("v").alias("nbr")
        )
        tips = (
            d1.join(ends, "v")
            .join(hub, "nbr", "left_semi")
            .select("v")
        )
        edges = (
            reduced.join(tips.withColumnRenamed("v", "s"), "s", "left_anti")
            .join(tips.withColumnRenamed("v", "d"), "d", "left_anti")
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
        n = edges.count()
        if n == prev:
            break
        prev = n

    # stage 2: bubble pop to fixpoint
    for _ in range(MAX_ITER):
        e1, e2 = edges.alias("e1"), edges.alias("e2")
        tp = e1.join(e2, F.col("e1.d") == F.col("e2.s")).select(
            F.col("e1.s").alias("u"),
            F.col("e1.d").alias("x"),
            F.col("e2.d").alias("w"),
        )
        bub = (
            tp.groupBy("u", "w")
            .agg(
                F.countDistinct("x").alias("n_mids"),
                F.min("x").alias("keep"),
            )
            .filter(F.col("n_mids") >= MIN_MIDS)
            .select("u", "w", "keep")
        )
        doomed = (
            tp.join(bub, ["u", "w"])
            .filter(F.col("x") != F.col("keep"))
            .select("u", "x", "w")
        )
        removal = (
            doomed.select(F.col("u").alias("s"), F.col("x").alias("d"))
            .union(
                doomed.select(F.col("x").alias("s"), F.col("w").alias("d"))
            )
            .distinct()
        )
        edges = edges.join(removal, ["s", "d"], "left_anti").localCheckpoint(eager=True)
        n = edges.count()
        if n == prev:
            break
        prev = n

    # stage 3: chain subgraph + one-step-per-round walk compaction
    out1 = (
        edges.groupBy("s")
        .agg(F.count("*").alias("c"))
        .filter("c = 1")
        .select("s")
    )
    in1 = (
        edges.groupBy("d")
        .agg(F.count("*").alias("c"))
        .filter("c = 1")
        .select("d")
    )
    chain = (
        edges.join(out1, "s", "left_semi")
        .join(in1, "d", "left_semi")
        .select("s", "d")
        .localCheckpoint(eager=True)
    )
    starts = chain.select(F.col("s").alias("v")).subtract(
        chain.select(F.col("d").alias("v"))
    )
    walk = (
        chain.join(starts.withColumnRenamed("v", "s"), "s", "left_semi")
        .select(
            F.col("s").alias("start"),
            F.col("d").alias("cur"),
            F.lit(1).alias("length"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(100):
        step = walk.join(
            chain.withColumnRenamed("s", "cur"), "cur", "left"
        ).select(
            "start",
            F.coalesce(F.col("d"), F.col("cur")).alias("cur"),
            (
                F.col("length")
                + F.when(F.col("d").isNotNull(), 1).otherwise(0)
            ).alias("length"),
        ).localCheckpoint(eager=True)
        moved = (
            step.agg(F.sum("length")).collect()[0][0]
            - walk.agg(F.sum("length")).collect()[0][0]
        )
        walk = step
        if moved == 0:
            break
    return walk.select(
        "start",
        F.col("cur").alias("end"),
        F.col("length").cast("bigint").alias("length"),
    ).orderBy("start")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("stock-b11-twin")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        assemble(spark, sf_dir).collect()
        times.append(time.perf_counter() - t0)
        print(f"[stock-b11] run{i}: {times[-1]:.3f}s", file=sys.stderr)
    print(
        f"[stock-b11] cold={times[0]:.3f}s "
        f"warm_median={statistics.median(times[1:]):.3f}s sf_dir={sf_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
