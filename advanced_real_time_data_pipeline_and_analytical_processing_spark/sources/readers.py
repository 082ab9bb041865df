"""Batch file readers (reference S4/S5, ``code/utils.py:136-165``).

Explicit schema when the registry has one (skips the inference pass),
header-aware CSV, JSON-lines, parquet. Unlike the reference there is no
double read: the streaming layer reads data files directly
(``streaming/ingest.py``), so these batch readers serve ad-hoc loads and
backfills.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType | None = None,
) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(list(paths) if isinstance(paths, (list, tuple)) else paths)


def read_json(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType | None = None,
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(list(paths) if isinstance(paths, (list, tuple)) else paths)


def read_batch_files(
    spark: SparkSession,
    paths: str | Sequence[str],
    fmt: str,
    schema: StructType | None = None,
) -> DataFrame:
    fmt = fmt.lower()
    if fmt == "csv":
        return read_csv(spark, paths, schema)
    if fmt == "json":
        return read_json(spark, paths, schema)
    if fmt == "parquet":
        return spark.read.parquet(*(paths if isinstance(paths, (list, tuple)) else [paths]))
    raise ValueError(f"unsupported format: {fmt}")
