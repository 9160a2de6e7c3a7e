"""P11 — the reference's tab-separated line wire format as a REAL
Spark data source (Python DataSource API, Spark 4).

The reference's protocols serialize every record as
`key-segment \\t key-segment \\t ... \\t value \\n` on the Hadoop
Streaming wire (reference src/Hadron/Protocol.hs lineC/parseLine,
src/Hadron/Types.hs key-segment tabbing); COVERAGE previously mapped
P11 to "n/a — schema'd columns replace the tab wire format". This
module closes that last protocol row with a first-class source/sink:

    spark.dataSource.register(HadronLineDataSource)
    df = (spark.read.format("hadron_line")
          .option("path", dir_or_glob).option("key_segments", "2")
          .load())                      # k1,k2,value columns
    df.write.format("hadron_line").option("path", out_dir).save()

Scale shape: one input partition PER FILE (the same unit a streaming
mapper received), so a directory of N files fans out N-wide; .gz
files decode transparently (the reference's gzip protocol wrapper,
P6). The value keeps any tabs beyond the declared key segments —
exactly parseLine's "split first k tabs" contract."""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StringType, StructField, StructType


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        names = sorted(
            f for f in os.listdir(path) if not f.startswith(("_", "."))
        )
        return [os.path.join(path, f) for f in names]
    hits = sorted(_glob.glob(path))
    if not hits:
        raise FileNotFoundError(path)
    return hits


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class _LineReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.k = int(options.get("key_segments", "1"))

    def partitions(self):
        return [_FilePartition(f) for f in _expand(self.path)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        opener = gzip.open if partition.file_path.endswith(".gz") else open
        with opener(partition.file_path, "rb") as fh:
            for raw in io.BufferedReader(fh):
                line = raw.decode("utf-8").rstrip("\n")
                parts = line.split("\t", self.k)
                if len(parts) <= self.k:
                    parts = parts + [""] * (self.k + 1 - len(parts))
                yield tuple(parts)


class _LineWriterMessage(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class _LineWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType):
        self.path = options["path"]
        self.n_cols = len(schema.fields)

    def write(self, rows: Iterator) -> _LineWriterMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.tsv")
        tmp = out + "._tmp"  # tmp-then-rename, the FanOut.hs contract
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in rows:
                fh.write("\t".join("" if v is None else str(v) for v in row))
                fh.write("\n")
                n += 1
        os.replace(tmp, out)
        return _LineWriterMessage(out, n)


class HadronLineDataSource(DataSource):
    """`hadron_line` format: (k1..kN string, value string) rows over
    tab-framed line files, one partition per file."""

    @classmethod
    def name(cls) -> str:
        return "hadron_line"

    def schema(self) -> StructType:
        k = int(self.options.get("key_segments", "1"))
        fields = [StructField(f"k{i + 1}", StringType()) for i in range(k)]
        fields.append(StructField("value", StringType()))
        return StructType(fields)

    def reader(self, schema: StructType) -> _LineReader:
        return _LineReader(dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> _LineWriter:
        return _LineWriter(dict(self.options), schema)
