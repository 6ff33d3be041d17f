"""B16 output-identity check: the stock twin's full-table overwrite
merge and the engine's merge-on-read commit must produce the SAME
logical table for the SAME fixture and batch — run before recording
the B16 budget so both sides provably measure the same upsert
(BASELINE.md B10–B15 discipline; B16's twin cannot import engine code,
so the cross-check lives here).

Run:  PYTHONPATH=. python benchmarks/verify_b16_identity.py [sf_dir]
Prints the row counts and a PASS/FAIL line; exits nonzero on FAIL.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

from pyspark.sql import SparkSession

from benchmarks.stock_twin_b16 import build_fixture, stock_upsert


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("verify-b16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sora_spark.sources import commit_log as cl

    base = tempfile.mkdtemp(prefix="sora_b16_verify_")
    try:
        table, batch = build_fixture(spark, sf_dir, base)
        stock_upsert(spark, table, batch, f"{base}/stock_out")
        stock = spark.read.parquet(f"{base}/stock_out")

        # engine side: same snapshot as 16 commit-log directories
        snap = spark.read.parquet(table)
        tiled = snap.withColumn(
            "_t", F.ntile(16).over(Window.orderBy("k"))
        ).localCheckpoint(eager=True)
        path = f"{base}/engine_table"
        cl.create_table(spark, path, tiled.filter("_t = 1").drop("_t"),
                        stats_cols=["k"])
        for t in range(2, 17):
            cl.append(spark, path,
                      tiled.filter(f"_t = {t}").drop("_t"),
                      stats_cols=["k"])
        cl.merge_upsert(spark, path, batch, ["k"], "ts",
                        merge_on_read=True)
        engine = cl.read_table(spark, path)

        n_stock, n_engine = stock.count(), engine.count()
        d1 = engine.exceptAll(stock).count()
        d2 = stock.exceptAll(engine).count()
        ok = n_stock == n_engine and d1 == 0 and d2 == 0
        print(
            f"[verify-b16] stock={n_stock} engine={n_engine} "
            f"engine-stock={d1} stock-engine={d2} "
            f"{'PASS' if ok else 'FAIL'} sf_dir={sf_dir}"
        )
        if not ok:
            sys.exit(1)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
