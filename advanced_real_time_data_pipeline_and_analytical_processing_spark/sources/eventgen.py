"""Custom Python Data Source (Spark 4 DataSource API): deterministic
synthetic event generation, in-cluster.

Why an engine needs this: scale and soak tests should GENERATE their
input across executors instead of shipping terabytes of fixture files
— `spark.read.format("eventgen").option("n_rows", 10**10)` fans the
range out over partitions with zero I/O. The reference has nothing
pluggable at all (fixed CSV/JSON readers); this demonstrates the
engine's source surface is open.

Every column derives from md5(event_id) arithmetic — no RNG state —
so the SAME rows come back at any partitioning, retries are
idempotent, and (deliberately) the whole table is replayable in any
engine with md5(): the DuckDB oracle regenerates it from
generate_series and must hash-match. value is h/2^52*100.0 — one IEEE
multiply off an exact binary scale, bit-identical everywhere,
NO rounding involved.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("click", "view", "purchase", "scroll", "signup")
_SCALE = float(1 << 52)  # 13 hex digits = 52 bits, exact in a double


def _h13(tag: str, i: int) -> int:
    return int(hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:13], 16)


def gen_row(i: int, n_users: int) -> tuple:
    return (
        i,
        _h13("u", i) % n_users,
        EVENT_TYPES[_h13("t", i) % len(EVENT_TYPES)],
        _h13("v", i) / _SCALE * 100.0,
    )


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_users = int(options.get("n_users", 100))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        # contiguous ranges: each partition is independently computable
        # (the property that lets a 1000-executor run generate 10^12
        # rows with no coordination and no shuffle)
        step = -(-self.n_rows // self.n_partitions)
        return [
            InputPartition((lo, min(lo + step, self.n_rows)))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield gen_row(i, self.n_users)


class EventGenDataSource(DataSource):
    """spark.read.format("eventgen").option("n_rows", N)..."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema):
        return _Reader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(EventGenDataSource)


def oracle_sql(n_rows: int, n_users: int) -> str:
    """DuckDB regeneration of the exact same table."""
    types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    return f"""
        SELECT i AS event_id,
               CAST('0x' || substr(md5('u:' || i), 1, 13) AS BIGINT)
                 % {n_users} AS user_id,
               list_value({types})[
                 CAST(CAST('0x' || substr(md5('t:' || i), 1, 13) AS BIGINT)
                      % {len(EVENT_TYPES)} AS INT) + 1] AS event_type,
               CAST(CAST('0x' || substr(md5('v:' || i), 1, 13) AS BIGINT)
                    AS DOUBLE) / {_SCALE} * 100.0 AS value
        FROM generate_series(0, {n_rows - 1}) AS t(i)
    """


class _StreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator: the offset is just the
    next event_id, so checkpoint recovery and readBetweenOffsets
    replay are trivially exact — gen_row is pure, a replayed offset
    range regenerates byte-identical rows (exactly-once without any
    source-side bookkeeping)."""

    def __init__(self, options):
        self.per_batch = int(options.get("rows_per_batch", 1000))
        self.n_users = int(options.get("n_users", 100))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = lo + self.per_batch
        return (
            iter([gen_row(i, self.n_users) for i in range(lo, hi)]),
            {"next": hi},
        )

    def readBetweenOffsets(self, start, end):
        return iter(
            [gen_row(i, self.n_users) for i in range(start["next"], end["next"])]
        )
