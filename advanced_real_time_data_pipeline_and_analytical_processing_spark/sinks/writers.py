"""Sinks (reference K1-K4).

- quarantine: bad rows + error_reason + quarantine_date, parquet
  partitioned by quarantine_date (reference K3 used JSON,
  ``code/helpers.py:229-244``; parquet keeps pushdown on re-reads).
- audit: explicit-schema one-row-per-batch table partitioned by
  audit_date (fixes reference anti-pattern §4.3-10: inferred audit
  schema), counts sourced from ``observe()`` metrics, not extra actions.
- jdbc: append with batching; retry with exponential backoff (reference
  R1, ``code/helpers.py:14-44``). Gated behind driver availability.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, TypeVar

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

T_ = TypeVar("T_")

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("audit_ts", T.TimestampType(), False),
        T.StructField("batch_id", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("total_rows", T.LongType(), False),
        T.StructField("good_rows", T.LongType(), False),
        T.StructField("bad_rows", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("message", T.StringType(), True),
        T.StructField("audit_date", T.StringType(), False),
    ]
)


def retry(attempts: int = 3, delay_s: float = 5.0, backoff: float = 2.0):
    """Reference R1 semantics (``code/helpers.py:14-44``)."""

    def deco(fn: Callable[..., T_]) -> Callable[..., T_]:
        def wrapped(*args, **kwargs) -> T_:
            wait = delay_s
            for attempt in range(1, attempts + 1):
                try:
                    return fn(*args, **kwargs)
                except Exception:
                    if attempt == attempts:
                        raise
                    time.sleep(wait)
                    wait *= backoff
            raise RuntimeError("unreachable")

        wrapped.__name__ = getattr(fn, "__name__", "retried")
        return wrapped

    return deco


@retry()
def write_quarantine(bad: DataFrame, out_dir: str, error_col: str = "error_reason") -> None:
    """Bad rows partitioned by quarantine_date; append-mode parquet.
    Partition pruning on the date keeps replays/inspections cheap."""
    (
        bad.withColumn(
            "quarantine_date", F.date_format(F.current_timestamp(), "yyyy-MM-dd")
        )
        .write.mode("append")
        .partitionBy("quarantine_date")
        .parquet(out_dir)
    )


@dataclass
class AuditRecord:
    batch_id: int | None
    source: str
    fmt: str
    total_rows: int
    good_rows: int
    bad_rows: int
    status: str
    message: str | None = None


@retry()
def write_audit(spark: SparkSession, out_dir: str, rec: AuditRecord) -> None:
    """One-row explicit-schema audit append; coalesce(1) is fine at this
    cardinality (reference K4)."""
    import datetime as dt

    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    row = [
        (
            now,
            rec.batch_id,
            rec.source,
            rec.fmt,
            rec.total_rows,
            rec.good_rows,
            rec.bad_rows,
            rec.status,
            rec.message,
            now.strftime("%Y-%m-%d"),
        )
    ]
    (
        spark.createDataFrame(row, AUDIT_SCHEMA)
        .coalesce(1)
        .write.mode("append")
        .partitionBy("audit_date")
        .parquet(out_dir)
    )


@retry()
def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    mode: str = "append",
) -> None:
    """JDBC append with batched inserts (reference K1/K2,
    ``code/utils.py:203-205``). Plain at-least-once append — for
    exactly-once-per-key replays use
    ``sinks.jdbc_upsert.upsert_jdbc`` (staging table + row_hash-keyed
    MERGE, tested against embedded Derby)."""
    props = {"batchsize": "5000", "rewriteBatchedStatements": "true"}
    props.update(properties or {})
    df.write.jdbc(url=url, table=table, mode=mode, properties=props)


def write_partitioned_parquet(
    df: DataFrame, out_dir: str, partition_cols: list[str], mode: str = "append"
) -> None:
    """The engine's native serving store: partitioned columnar parquet
    (replaces the reference's Postgres serving tables for analytics)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(out_dir)
