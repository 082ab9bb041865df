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
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
