"""Catalog-layer timestamp semantics.

events.parquet stores ts as TIMESTAMP(NANOS); Spark has no nanos type so
the session reads it as long (nanosAsLong) and catalog.load_table
truncates to micros. The division MUST be int64-exact: float division
(`/ 1000` + cast) loses precision above 2^53 and lands ~12% of real
epoch-nanos on the wrong microsecond (ADVICE r1)."""

from __future__ import annotations

import pyarrow.parquet as pq

from advanced_real_time_data_pipeline_and_analytical_processing_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_ns_to_us_matches_pyarrow_truncation(spark):
    # pyarrow ground truth: int64 -> floor-division microseconds,
    # whatever unit the fixture writer chose (ns in round 1-2 data,
    # plain us since round 3)
    tbl = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id", "ts"])
    unit = tbl.schema.field("ts").type.unit
    raw = dict(zip(tbl["event_id"].to_pylist(), tbl["ts"].cast("int64").to_pylist()))
    to_us = {"ns": lambda v: v // 1000, "us": lambda v: v, "ms": lambda v: v * 1000}[unit]
    expected = {k: to_us(v) for k, v in raw.items()}

    df = load_table(spark, SF_DIR, "events").selectExpr(
        "event_id", "unix_micros(ts) AS us"
    )
    got = {r["event_id"]: r["us"] for r in df.collect()}
    assert got == expected  # exact on every row, not just most
