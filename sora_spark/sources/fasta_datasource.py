"""FASTA as a first-class Spark data source (Python DataSource API,
Spark 4): `spark.read.format("fasta").load(path)` → (file, record_id,
header, sequence).

Compared to the DataFrame-parse path (`sources.text.read_fasta`), this
is the *engine-integrated* form: one InputPartition per file, so reads
parallelize across files (the scale layout for sequencing data), the
schema is fixed at plan time, and record grouping happens inside the
partition reader — line order is trivially correct because each reader
owns its whole file. The reader streams records and never holds more
than one record in memory beyond the raw line iteration."""

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


class _FastaPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FastaReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fasta source requires a path")

    def partitions(self):
        if os.path.isdir(self.path):
            # escape the dir part: a directory named 'run[1]' must list
            # its own contents, not be read as a character class
            files = sorted(
                p for p in glob.glob(os.path.join(glob.escape(self.path), "*"))
                if os.path.isfile(p)
                # never read writer staging files: an orphaned temp from
                # a failed/speculative task attempt is not data (review
                # finding — the two-phase-commit contract depends on it)
                and not os.path.basename(p).startswith("_tmp_")
            )
        elif os.path.isfile(self.path):
            # literal file first: a name containing glob metacharacters
            # (e.g. 'sample[1].fa') must read as itself, not as a pattern
            files = [self.path]
        else:
            files = sorted(glob.glob(self.path))
        if not files and not os.path.exists(self.path):
            # fail fast at plan time, not as an executor traceback
            raise FileNotFoundError(f"fasta source: no such path {self.path!r}")
        return [_FastaPartition(p) for p in files]

    def read(self, partition: _FastaPartition):
        # file key matches input_file_name()'s URI form so this source
        # joins/unions cleanly with the DataFrame-parse path
        file_uri = "file://" + os.path.abspath(partition.path)
        rec_id = 0
        header = None
        seq: list[str] = []
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\r\n")
                if not line:
                    continue
                if line.startswith(">"):
                    if header is not None:
                        yield (file_uri, rec_id, header, "".join(seq))
                    rec_id += 1
                    header = line[1:]
                    seq = []
                elif header is not None:
                    seq.append(line)
            if header is not None:
                yield (file_uri, rec_id, header, "".join(seq))


class _FastaCommit(WriterCommitMessage):
    def __init__(self, tmp: str, final: str):
        self.tmp = tmp
        self.final = final


class FastaWriter(DataSourceWriter):
    """Engine-integrated FASTA SINK (the write half of the Python
    DataSource API): each task streams its partition into a temp file
    and the driver-side commit atomically renames every temp into
    place — the standard two-phase file-commit contract, so a failed
    task leaves only unreferenced temps (removed by abort) and readers
    never observe half-written records. Input rows must carry `header`
    and `sequence` columns; sequences are wrapped at 60 chars, the
    layout the reader reassembles losslessly."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fasta sink requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        final = f"part-{uuid.uuid4().hex}.fa"
        tmp = os.path.join(self.path, f"_tmp_{final}")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f">{row.header}\n")
                seq = row.sequence or ""
                for i in range(0, max(len(seq), 1), 60):
                    fh.write(seq[i : i + 60] + "\n")
        return _FastaCommit(tmp, final)

    def commit(self, messages):
        ours = {os.path.basename(m.tmp) for m in messages if m is not None}
        if self.overwrite:
            for f in os.listdir(self.path):
                # remove prior data AND stale temps from crashed runs —
                # but never this run's own staged temps
                if f not in ours:
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            if m is not None:
                os.replace(m.tmp, os.path.join(self.path, m.final))

    def abort(self, messages):
        # failed tasks contribute None commit messages (the documented
        # DataSourceWriter contract) — skip them, clean the rest
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.tmp)
            except OSError:
                pass


class FastaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fasta"

    def schema(self) -> str:
        return (
            "file string, record_id int, header string, sequence string"
        )

    def reader(self, schema: StructType) -> FastaReader:
        return FastaReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> FastaWriter:
        names = set(schema.fieldNames())
        if not {"header", "sequence"} <= names:
            raise ValueError(
                "fasta sink requires header and sequence columns, got "
                f"{sorted(names)}"
            )
        return FastaWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration: `spark.read.format("fasta")` works
    afterwards."""
    spark.dataSource.register(FastaDataSource)
