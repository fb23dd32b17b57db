"""Custom connector via the Python Data Source API (Spark 4).

The reference's only source is a parquet directory
(``/root/reference/src/padawan/persisted_dataset.py:66-84``); Spark 4's
``pyspark.sql.datasource`` lets this engine add arbitrary pure-Python
connectors (REST paginators, proprietary formats, synthetic generators)
that still plug into Catalyst with a real schema and task-parallel
partitions — each ``InputPartition`` becomes one Spark task, so a
connector scales out exactly like a file scan.

``SequenceSource`` is the in-tree demonstration: a deterministic
partitioned integer sequence (id, square, bucket) — the Python analog of
``spark.range`` with computed columns, used by the ``adv_custom_source``
oracle query.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import LongType, StructField, StructType

_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("square", LongType(), False),
    StructField("bucket", LongType(), False),
])


class _SequenceReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [InputPartition((i * step, min((i + 1) * step, self.n)))
                for i in range(self.parts) if i * step < self.n]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, i * i, i % 7)


class SequenceSource(DataSource):
    """``spark.read.format("pyseq").option("n", ...).option("parts", ...)``."""

    @classmethod
    def name(cls):
        return "pyseq"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _SequenceReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotently register the in-tree Python data sources."""
    spark.dataSource.register(SequenceSource)
