"""B16 stock-PySpark twin: batch UPSERT into a persisted parquet table,
written the way a stock PySpark user does it — read the WHOLE table,
union the batch, keep the latest row per key (batch wins ties), and
overwrite the table directory. No commit log, no stats pruning, no
deletion vectors: a ~26k-row batch costs a full-table read plus a
full-table write, which is exactly the cost shape the engine's
commit-log merge (stats-pruned, merge-on-read) exists to avoid.

Fixture (the b16_* helpers here are imported by bench.py's _bench_q16
so both sides share it byte-for-byte): lineitem → (k = l_orderkey*8 +
l_linenumber, qty, price, ts = l_shipdate), replicated 4x into
disjoint key spaces (the scale_probe discipline — real growth, joins
keep their selectivity; at sf0.1 that is a 2.4M-row table, big enough
that the work term dominates the engine's fixed per-commit job count
instead of drowning it), laid out as 16 key-range directories; batch
= the top-sixteenth key range's k % 10 == 0 rows with price+1000 /
ts+1 day (updates) plus the same rows shifted past kmax (inserts).
Output identity between this twin's merged table and the engine's
post-merge read is verified by benchmarks/verify_b16_identity.py
before the budget is recorded, so both sides measure the same
logical upsert.

Methodology mirrors BASELINE.md's B10–B15 twins: stock session conf
(shuffle.partitions=8, AQE defaults, no engine code imported), 1 cold
+ 3 warm runs, median warm is the baseline column; budget = 2x that.
Each run rewrites to a fresh directory (the stock tmp-then-swap
idiom) and the write is included in the timed region — durability is
part of an upsert.

Run:  python benchmarks/stock_twin_b16.py [sf_dir]
"""

from __future__ import annotations

import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

B16_REPLICAS = 4


def b16_snapshot(spark: SparkSession, sf_dir: str):
    """The shared B16 base table: lineitem keyed by a dense synthetic
    key, replicated B16_REPLICAS times into disjoint key spaces."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k0"),
        F.col("l_quantity").alias("qty"),
        F.round("l_extendedprice", 2).alias("price"),
        F.col("l_shipdate").alias("ts"),
    )
    # the synthetic lineitem does NOT keep (orderkey, linenumber)
    # unique (~24% dup keys) — dedup deterministically so the fixture
    # is key-unique, the merge-table contract both the engine's MOR
    # path and the stock window-dedup agree on (with dup current keys
    # they legitimately diverge: rewrite dedups, MOR keeps both)
    wdup = Window.partitionBy("k0").orderBy("qty", "price", "ts")
    li = (
        li.withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1).drop("_rn")
    )
    k0max = li.agg(F.max("k0")).first()[0]
    reps = spark.range(B16_REPLICAS).selectExpr("id AS r")
    return li.crossJoin(F.broadcast(reps)).select(
        (F.col("k0") + F.col("r") * F.lit(k0max + 1)).alias("k"),
        "qty", "price", "ts",
    )


def b16_batch(spark: SparkSession, snap):
    """The shared B16 merge batch: top-sixteenth key range updates
    (k % 10 == 0, price+1000, ts+1 day) + the same rows shifted past
    kmax as inserts. Returns an eagerly checkpointed frame (batch
    construction is setup, not the measured upsert)."""
    kmax, lo = snap.agg(
        F.max("k"), F.expr("percentile_approx(k, 0.9375)")
    ).first()
    upd = (
        snap.filter((F.col("k") >= lo) & (F.col("k") % 10 == 0))
        .withColumn("price", F.round(F.col("price") + 1000, 2))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
    )
    ins = upd.withColumn("k", F.col("k") + F.lit(kmax))
    return upd.unionByName(ins).localCheckpoint(eager=True)


def build_fixture(spark: SparkSession, sf_dir: str, base: str):
    """Stock-side fixture: the snapshot as a 16-file parquet table.
    Returns (table_path, batch_df)."""
    snap = b16_snapshot(spark, sf_dir)
    table = f"{base}/table"
    snap.repartitionByRange(16, "k").write.mode("error").parquet(table)
    return table, b16_batch(spark, snap)


def stock_upsert(spark: SparkSession, table: str, batch, out: str):
    """Full-table overwrite merge: latest ts per key, batch wins ties."""
    cur = spark.read.parquet(table).withColumn("_src", F.lit(0))
    new = batch.withColumn("_src", F.lit(1))
    w = Window.partitionBy("k").orderBy(
        F.col("ts").desc(), F.col("_src").desc()
    )
    merged = (
        cur.unionByName(new)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    merged.write.mode("overwrite").parquet(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("stock-b16-twin")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="sora_b16_stock_")
    try:
        table, batch = build_fixture(spark, sf_dir, base)
        times = []
        for i in range(4):
            out = f"{base}/merged-{i}"
            t0 = time.perf_counter()
            stock_upsert(spark, table, batch, out)
            times.append(time.perf_counter() - t0)
            print(f"[stock-b16] run{i}: {times[-1]:.3f}s", file=sys.stderr)
            shutil.rmtree(out, ignore_errors=True)
        print(
            f"[stock-b16] cold={times[0]:.3f}s "
            f"warm_median={statistics.median(times[1:]):.3f}s "
            f"sf_dir={sf_dir}"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
