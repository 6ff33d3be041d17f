"""Line-oriented text record source: FASTA/FASTQ-style '>'-header
records (the reference's native input shape — sequencing reads — per
SURVEY §2.1) parsed into (record_id, header, sequence) rows.

Spark-first parse: `spark.read.text` keeps line order within each file
split; records are rebuilt with a running header count. Window is
partitioned per input file so parallelism scales with file count (the
normal case for sequencing data at scale: many files); lines within
one file split stay ordered by `monotonically_increasing_id`.

SPLIT-ORDERING CONTRACT: `monotonically_increasing_id` encodes the
partition index, and Spark assigns one split per partition in listing
order for a given file — but split→partition ORDER is not a documented
API guarantee. `read_fasta` therefore asserts every input file fits a
SINGLE split (file length <= spark.sql.files.maxPartitionBytes, a
metadata-only check; partition-count scan fallback without a JVM
gateway) and fails loudly otherwise, instead of silently scrambling
sequence lines across split boundaries. For
multi-TB single files, pre-split upstream (bgzip chunks / one file per
shard) — the many-small-files layout is the scale path anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _assert_single_split(spark: SparkSession, path: str) -> None:
    """Fail loudly if any input file spans >1 read split (see module
    docstring): line order across splits is not a guaranteed contract.
    """
    try:  # metadata-only check via Hadoop FS (classic mode)
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        max_bytes = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(hconf)
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            st = it.next()
            if st.getLen() > max_bytes:
                raise ValueError(
                    f"read_fasta: {st.getPath()} is {st.getLen()} bytes >"
                    f" maxPartitionBytes={max_bytes}; it would be read as"
                    " multiple splits with undefined line order. Pre-split"
                    " the file or raise spark.sql.files.maxPartitionBytes."
                )
    except ValueError:
        raise
    except Exception:
        # No JVM gateway (e.g. Spark Connect): fall back to counting
        # actual read partitions per file — one extra scan, same contract.
        bad = (
            spark.read.text(path)
            .select(
                F.input_file_name().alias("file"),
                F.spark_partition_id().alias("pid"),
            )
            .groupBy("file")
            .agg(F.countDistinct("pid").alias("n_splits"))
            .filter(F.col("n_splits") > 1)
            .count()
        )
        if bad:
            raise ValueError(
                f"read_fasta: {bad} input file(s) span multiple read splits;"
                " line order across splits is undefined — pre-split upstream."
            )


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Parse FASTA-style text: '>header' lines start records; following
    lines concatenate into the record's sequence."""
    _assert_single_split(spark, path)
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
