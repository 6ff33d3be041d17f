"""FASTQ as a first-class Spark data source (Python DataSource API,
Spark 4): `spark.read.format("fastq").load(path)` → (file, record_id,
header, sequence, quality).

The sequencing-read twin of sources/fasta_datasource.py: 4-line
records (@header / sequence / '+' / quality), one InputPartition per
file so reads parallelize across files — the layout real sequencer
output ships in. The reader validates the format invariant the
quality-aware operators depend on (len(quality) == len(sequence)) at
read time, per record, so a truncated file fails loudly instead of
feeding misaligned phred scores downstream."""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _FastqPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FastqReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fastq source requires a path")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                p for p in glob.glob(os.path.join(glob.escape(self.path), "*"))
                if os.path.isfile(p)
                and not os.path.basename(p).startswith("_tmp_")
            )
        elif os.path.isfile(self.path):
            files = [self.path]
        else:
            files = sorted(glob.glob(self.path))
        if not files and not os.path.exists(self.path):
            raise FileNotFoundError(f"fastq source: no such path {self.path!r}")
        return [_FastqPartition(p) for p in files]

    def read(self, partition: _FastqPartition):
        file_uri = "file://" + os.path.abspath(partition.path)
        rec_id = 0
        with open(partition.path, encoding="utf-8") as fh:
            while True:
                header = fh.readline()
                if not header:
                    break
                header = header.rstrip("\r\n")
                if not header:
                    continue
                if not header.startswith("@"):
                    raise ValueError(
                        f"fastq: record {rec_id + 1} in {partition.path} "
                        f"does not start with '@': {header[:40]!r}"
                    )
                seq = fh.readline().rstrip("\r\n")
                plus = fh.readline().rstrip("\r\n")
                qual = fh.readline().rstrip("\r\n")
                if not plus.startswith("+"):
                    raise ValueError(
                        f"fastq: record {rec_id + 1} in {partition.path} "
                        f"separator line is {plus[:40]!r}, expected '+'"
                    )
                if len(qual) != len(seq):
                    raise ValueError(
                        f"fastq: record {rec_id + 1} in {partition.path} "
                        f"quality length {len(qual)} != sequence length "
                        f"{len(seq)} (truncated file?)"
                    )
                rec_id += 1
                yield (file_uri, rec_id, header[1:], seq, qual)


class _FastqCommit(WriterCommitMessage):
    def __init__(self, tmp: str, final: str):
        self.tmp = tmp
        self.final = final


class FastqWriter(DataSourceWriter):
    """FASTQ sink with the same two-phase file-commit contract as the
    FASTA writer: tasks stage `_tmp_*` files, driver commit atomically
    renames, abort removes this run's temps (None messages from failed
    tasks are skipped). Rows must carry header/sequence/quality; the
    length invariant is enforced per row at write time.

    Single writer per target directory, like Spark's built-in file
    sinks: two jobs writing the same path concurrently are undefined
    (in overwrite mode the contents sweep would delete the other
    job's in-flight `_tmp_` files and break its commit renames).
    Spark's own parquet/csv sinks carry the identical caveat — their
    overlapping `_temporary` dirs and final-file sweeps corrupt each
    other too — so this documents the shared contract rather than
    adding pid-ownership tracking the built-ins don't have
    (r09 ADVICE, documentation route)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fastq sink requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        final = f"part-{uuid.uuid4().hex}.fq"
        tmp = os.path.join(self.path, f"_tmp_{final}")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                seq = row.sequence or ""
                qual = row.quality or ""
                if len(qual) != len(seq):
                    raise ValueError(
                        "fastq sink: quality length != sequence length "
                        f"at header={row.header!r}"
                    )
                if "\n" in seq or "\r" in seq or "\n" in qual or "\r" in qual:
                    raise ValueError(
                        "fastq sink: embedded newline would corrupt the "
                        f"4-line framing at header={row.header!r}"
                    )
                fh.write(f"@{row.header}\n{seq}\n+\n{qual}\n")
        return _FastqCommit(tmp, final)

    def commit(self, messages):
        finals = set()
        for m in messages:
            if m is not None:
                os.replace(m.tmp, os.path.join(self.path, m.final))
                finals.add(m.final)
        if self.overwrite:
            # mode("overwrite") replaces the directory's CONTENTS —
            # the same contract as Spark's built-in file sinks — so
            # the sweep removes every regular file not written by this
            # run, including foreign files: the reader lists every
            # non-_tmp_ file in the directory, so anything left behind
            # would be read back and silently violate overwrite
            # read-back == written-data (round-9 review finding; the
            # r08 pattern-restricted sweep had exactly that hole).
            # Ordering: sweep only AFTER every rename has succeeded,
            # so a crash mid-commit leaves extra stale files (append-
            # like, recoverable) rather than a partially-deleted
            # directory (r08 review finding). Subdirectories are left
            # alone — the sink never creates them and the reader
            # never descends into them.
            for f in os.listdir(self.path):
                if f in finals:
                    continue
                full = os.path.join(self.path, f)
                if os.path.isfile(full):
                    os.remove(full)

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.tmp)
            except OSError:
                pass


class FastqDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fastq"

    def schema(self) -> str:
        return (
            "file string, record_id int, header string, "
            "sequence string, quality string"
        )

    def reader(self, schema: StructType) -> FastqReader:
        return FastqReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> FastqWriter:
        names = set(schema.fieldNames())
        if not {"header", "sequence", "quality"} <= names:
            raise ValueError(
                "fastq sink requires header, sequence and quality "
                f"columns, got {sorted(names)}"
            )
        return FastqWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration: `spark.read.format("fastq")` works
    afterwards."""
    spark.dataSource.register(FastqDataSource)
