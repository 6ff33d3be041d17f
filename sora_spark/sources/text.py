"""Line-oriented text record source: FASTA/FASTQ-style '>'-header
records (the reference's native input shape — sequencing reads — per
SURVEY §2.1) parsed into (record_id, header, sequence) rows.

Spark-first parse: `spark.read.text` keeps line order within each file
split; records are rebuilt with a running header count. Window is
partitioned per input file so parallelism scales with file count (the
normal case for sequencing data at scale: many files); lines within
one file split stay ordered by `monotonically_increasing_id`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Parse FASTA-style text: '>header' lines start records; following
    lines concatenate into the record's sequence."""
    lines = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("line_id"),
            F.col("value").alias("line"),
        )
        .filter(F.length("line") > 0)
    )
    w = Window.partitionBy("file").orderBy("line_id")
    with_rec = lines.withColumn(
        "record_id",
        F.sum(F.when(F.col("line").startswith(">"), 1).otherwise(0)).over(w),
    )
    return (
        with_rec.filter(F.col("record_id") > 0)
        .groupBy("file", "record_id")
        .agg(
            F.max(F.when(F.col("line").startswith(">"), F.expr("substring(line, 2)"))).alias(
                "header"
            ),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("line").startswith(">"),
                                F.struct("line_id", "line"),
                            )
                        )
                    ),
                    lambda x: x["line"],
                ),
            ).alias("sequence"),
        )
        .select("record_id", "header", "sequence")
    )
