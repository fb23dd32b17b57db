"""Non-parquet sources/sinks: CSV and JSON-lines, as Datasets.

The reference is parquet-only (``/root/reference/src/padawan/
persisted_dataset.py``); these extend the engine to the other formats a
data pipeline ingests.  Readers take an explicit schema (schema
inference costs a full extra pass at 100 TB — always pass one in
production; ``infer=True`` exists for exploration).  All paths return
the same :class:`~padawan_spark.dataset.Dataset` facade so slicing /
repartitioning / manifest writing compose with any source format.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..dataset import Dataset


def scan_csv(spark: SparkSession, path: str,
             schema: StructType | str | None = None, header: bool = True,
             index_columns: Sequence[str] = (), infer: bool = False,
             **options) -> Dataset:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return Dataset(spark, reader.csv(path), index_columns=index_columns)


def scan_json(spark: SparkSession, path: str,
              schema: StructType | str | None = None,
              index_columns: Sequence[str] = (), **options) -> Dataset:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return Dataset(spark, reader.json(path), index_columns=index_columns)


def write_csv(df: DataFrame | Dataset, path: str, header: bool = True,
              mode: str = "overwrite", **options) -> None:
    if isinstance(df, Dataset):
        df = df.df
    w = df.write.option("header", str(header).lower()).mode(mode)
    for k, v in options.items():
        w = w.option(k, v)
    w.csv(path)


def write_json(df: DataFrame | Dataset, path: str, mode: str = "overwrite",
               **options) -> None:
    if isinstance(df, Dataset):
        df = df.df
    w = df.write.mode(mode)
    for k, v in options.items():
        w = w.option(k, v)
    w.json(path)
