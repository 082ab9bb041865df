"""Testdata catalog: load the driver's parquet tables and register views.

Mirrors the reference's per-dataset table registry (reference
``code/helpers.py:218-221`` derives one table per input file) but backed
by columnar parquet with full predicate pushdown / column pruning
instead of JDBC round-trips.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to plain TIMESTAMP whatever the
    fixture writer produced: TIMESTAMP(NANOS) read as bigint nanos
    (legacy nanosAsLong), or naive micros read as TIMESTAMP_NTZ.
    Session tz is pinned UTC, so the NTZ→LTZ cast is value-preserving.
    Works on batch and streaming frames alike."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        # Integer division, NOT `/ 1000` + cast: int64 epoch-nanos
        # exceed double's 53-bit exact range.
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) parquet columns arrive as bigint nanos (via
    # spark.sql.legacy.parquet.nanosAsLong); truncate to micros — the
    # same thing DuckDB's micros TIMESTAMP does on read.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer division, NOT `/ 1000` + cast: int64 epoch-nanos
        # (~1.7e18) exceed double's 53-bit exact range, so float division
        # lands on the wrong microsecond for ~12% of real fixture rows.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Naive parquet timestamps (no isAdjustedToUTC) arrive as
    # TIMESTAMP_NTZ, which event-time ops (watermarks, unix_micros,
    # double casts) reject. Session tz is pinned UTC, so the NTZ→LTZ
    # cast is value-preserving; normalize every such column here so all
    # queries see plain TIMESTAMP regardless of the fixture's writer.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
