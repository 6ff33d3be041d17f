"""B14 stock-PySpark twin: corpus BPE tokenization (qta20) written the
way a stock PySpark user would — same algorithm (train 6 merges on the
word-frequency table, then tokenize the corpus with them and report
the top-20 tokens by corpus-weighted frequency), but none of the
engine's structure:

- ENCODE runs over the full word-OCCURRENCE stream (one row per word
  per document) with a row-at-a-time Python UDF applying the merge
  fold, instead of the engine's encode-the-DISTINCT-vocab-then-
  hash-join shape that keeps Python work vocabulary-sized;
- per-round merge application during training is the same Python UDF
  over symbol arrays (a stock user reaches for a UDF here; the engine
  uses a whole-stage-codegen aggregate fold);
- pair counting via posexplode of the symbol arrays each round, fully
  recomputed (no checkpoint reuse discipline beyond what a stock user
  would write).

Methodology mirrors BASELINE.md's B10–B13 twins: stock session conf
(shuffle.partitions=8, AQE defaults, no engine code imported), 1 cold
+ 3 warm runs, median warm is the baseline column; budget = 2x that.
Output is verified identical to the engine's qta20 rows before timing
(same top-20 (token, total_n, n_words) set), so the twin measures the
same computation, not a lighter one.

Run:  python benchmarks/stock_twin_b14.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

N_MERGES = 6


def _fold(sym, a, b):
    out = []
    for x in sym:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def encode_topk(spark: SparkSession, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") > 0)
    wc = words.groupBy("word").agg(F.count("*").alias("n"))

    # --- train: 6 greedy merges on the word-frequency table ---
    sym_tbl = wc.select("word", "n", F.split("word", "").alias("sym"))
    sym_tbl = sym_tbl.localCheckpoint(eager=True)
    merges = []
    for _ in range(N_MERGES):
        pairs = (
            sym_tbl.select(
                "n", F.posexplode("sym").alias("i", "a"), "sym"
            )
            .filter(F.col("i") < F.size("sym") - 1)
            .select(
                "n",
                "a",
                F.element_at(
                    "sym", (F.col("i") + 2).cast("int")
                ).alias("b"),
            )
            .groupBy("a", "b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))

        @F.udf(ArrayType(StringType()))
        def apply_one(sym, _a=a, _b=b):
            return _fold(sym, _a, _b)

        sym_tbl = sym_tbl.withColumn(
            "sym", apply_one("sym")
        ).localCheckpoint(eager=True)

    # --- encode: full word-occurrence stream through a Python UDF ---
    merge_list = list(merges)

    @F.udf(ArrayType(StringType()))
    def enc(word):
        sym = list(word)
        for a, b in merge_list:
            sym = _fold(sym, a, b)
        return sym

    return (
        words.select(F.explode(enc("word")).alias("token"), "word")
        .groupBy("token")
        .agg(
            F.count("*").cast("bigint").alias("total_n"),
            F.countDistinct("word").cast("bigint").alias("n_words"),
        )
        .orderBy(F.desc("total_n"), "token")
        .limit(20)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("stock-b14-twin")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        encode_topk(spark, sf_dir).collect()
        times.append(time.perf_counter() - t0)
        print(f"[stock-b14] run{i}: {times[-1]:.3f}s", file=sys.stderr)
    print(
        f"[stock-b14] cold={times[0]:.3f}s "
        f"warm_median={statistics.median(times[1:]):.3f}s sf_dir={sf_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
