"""A custom Spark 4 Python Data Source for the reference engine's own
output format: `word:count` lines (reference: src/utils.cpp:47-54 writes
them; SURVEY §1.4 notes the format is ambiguous when words contain ':'
— 1,330 such lines in serial_wc.txt — so parsing splits from the
RIGHT).

This is the "connector" story in miniature: the engine can mount the
reference's native artifacts as a first-class table via
``spark.read.format("wordcount_text")``, with schema, partition
planning (one partition per file), and right-split parsing all inside
the source. Registered with ``register_wordcount_source(spark)``.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("word", StringType(), nullable=False),
        StructField("count", LongType(), nullable=False),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class WordCountTextReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("wordcount_text source requires a path")
        import glob
        import os

        if os.path.isdir(path):
            self._files = sorted(glob.glob(os.path.join(path, "*")))
        else:
            self._files = sorted(glob.glob(path)) or [path]

    def partitions(self):
        # one task per file: files are independent reducer outputs in
        # the reference layout (output_files/output{i}.txt)
        return [_FilePartition(p) for p in self._files]

    def read(self, partition: _FilePartition):
        with open(partition.path, "rb") as fh:
            for raw in fh:
                line = raw.rstrip(b"\n").rstrip(b"\r")
                if not line:
                    continue
                # words may contain ':' — the count never does, so split
                # from the right (SURVEY §1.4)
                word, _, count = line.rpartition(b":")
                yield (word.decode("utf-8", "surrogateescape"), int(count))


class WordCountTextSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wordcount_text"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> WordCountTextReader:
        return WordCountTextReader(self.options)


def register_wordcount_source(spark) -> None:
    spark.dataSource.register(WordCountTextSource)
