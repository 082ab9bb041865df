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
    if fmt == "orc":
        # built-in columnar alternative (orc-core ships inside Spark);
        # same predicate-pushdown/column-pruning surface as parquet
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.orc(*(paths if isinstance(paths, (list, tuple)) else [paths]))
    raise ValueError(f"unsupported format: {fmt}")


CORRUPT_COL = "_corrupt_record"


def read_json_permissive(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType,
) -> tuple[DataFrame, DataFrame]:
    """JSON read that captures malformed lines instead of dropping them
    (the reference quarantines bad ROWS but silently loses unparseable
    LINES — Spark's default PERMISSIVE mode nulls them out without a
    trace unless the corrupt column is declared). Returns (good, bad):
    ``good`` has the declared schema; ``bad`` is one string column of
    the raw corrupt lines for the quarantine sink.

    The corrupt column must be part of the read schema — adding it
    after the fact silently yields no captures. Spark also refuses to
    SELECT only the corrupt column from the raw read (a correctness
    guard: such a query could skip parsing entirely), so we cache the
    frame and split it into the two legs from one pass."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    read_schema = StructType(
        [*schema.fields]
    ).add(CORRUPT_COL, StringType())
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(list(paths) if isinstance(paths, (list, tuple)) else paths)
    )
    raw = raw.cache()
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def read_parquet_evolving(
    spark: SparkSession,
    path: str | Sequence[str],
) -> DataFrame:
    """Parquet read across files written under an EVOLVING schema
    (columns added over time): ``mergeSchema`` unions the per-file
    footers, older files surface the new columns as NULL. Off by
    default in Spark because footer-merging costs a pass over every
    file footer at planning time — turn it on at the call site, not
    globally, and compact old files forward when the column set
    stabilizes."""
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(*(path if isinstance(path, (list, tuple)) else [path]))
    )
