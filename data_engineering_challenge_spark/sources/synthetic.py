"""Custom Python DataSource (Spark 4 DataSource V2 API): deterministic
synthetic document generator.

A training pipeline needs reproducible synthetic corpora (load tests,
schema rehearsals, CI fixtures) without shipping data files. This
source generates them executor-side: the driver materializes NOTHING —
`partitions()` returns lightweight range descriptors and each task
generates its own rows, so a 10-billion-doc corpus costs zero driver
memory and scales with the cluster exactly like a parquet scan.

Determinism: content derives from md5(doc_id) only — same rows for any
partition count, any executor placement, any run. (No RNG: seeds do
not survive re-partitioning; content-addressed generation does.)

Usage:
    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("n_docs", 100000).option("n_partitions", 32).load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_WORDS = (
    "data engine spark shuffle partition broadcast join scan filter "
    "aggregate window stream state parquet column row batch vector "
    "hash sort merge spill codegen plan catalyst tungsten arrow"
).split()

_LANGS = ("en", "fr", "es", "de")

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), nullable=False),
        StructField("text", StringType(), nullable=False),
        StructField("lang", StringType(), nullable=False),
        StructField("source", StringType(), nullable=False),
        StructField("n_chars", LongType(), nullable=False),
    ]
)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _doc(doc_id: int) -> tuple[int, str, str, str, int]:
    h = hashlib.md5(str(doc_id).encode()).digest()
    n_words = 5 + h[0] % 60
    words = [_WORDS[(h[1 + i % 14] + i * h[2]) % len(_WORDS)] for i in range(n_words)]
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[h[3] % len(_LANGS)],
        f"synthetic-{h[4] % 4}",
        len(text),
    )


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.n_docs // self.n_partitions))
        return [
            _Range(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _doc(doc_id)


class SyntheticDocsDataSource(DataSource):
    """spark.read.format("synthetic_docs") — executor-parallel
    deterministic document corpus."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(self.options)
