"""Registry-wide emission-type lint (r9, VERDICT r8 #3).

The r8 probe decode root-caused the seven-round driver-red pair:
values, row counts, and schema all agreed — the divergence was the
harness's value normalization of output types Spark never emits
(DuckDB HUGEINT from sum(BIGINT); DECIMAL(38,0) from exact sums).
Local string comparison masks the type, so a local PASS said nothing
about the driver's Arrow/pandas fetch path. These lints make the
class extinct:

1. every `oracle_sql()` entry must DESCRIBE to Spark-emittable DuckDB
   types only (no HUGEINT, no DECIMAL, no unsigned);
2. every `queries()` entry's Spark schema must carry no DecimalType
   anywhere (top level or nested) — the mirror-image hazard.

DESCRIBE is static typing (no execution), so both lints are cheap
enough to run over all ~220 registry entries every pytest run.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from advanced_real_time_data_pipeline_and_analytical_processing_spark.catalog import TABLES
from tools.lint_oracle_types import type_ok

SF = "/root/testdata/sf0.001"


def test_every_oracle_emits_spark_types_only():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    bad = []
    for name, sql in em.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad += [
            f"{name}.{col}: {typ}"
            for col, typ, *_ in desc
            if not type_ok(typ)
        ]
    assert not bad, f"{len(bad)} oracle columns with non-Spark types: {bad}"


def test_emit_bigint_pins_exist_in_their_oracles():
    # a renamed/removed column in a pinned oracle must fail loudly,
    # not silently stop casting (the DESCRIBE lint would also catch
    # the resulting HUGEINT, but this names the stale pin directly)
    oracles = em.oracle_sql()
    for name, cols in em._EMIT_BIGINT.items():
        assert name in oracles, f"stale _EMIT_BIGINT pin: {name}"
        for c in cols:
            assert (
                f"CAST({c} AS BIGINT) AS {c}" in oracles[name]
            ), f"{name}.{c} not cast in emitted oracle"


def _no_decimal(dt) -> list:
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return [str(dt)]
    if isinstance(dt, T.StructType):
        return [b for f in dt.fields for b in _no_decimal(f.dataType)]
    if isinstance(dt, T.ArrayType):
        return _no_decimal(dt.elementType)
    if isinstance(dt, T.MapType):
        return _no_decimal(dt.keyType) + _no_decimal(dt.valueType)
    return []


def test_every_spark_query_schema_is_decimal_free(spark):
    # constructing the DataFrame is enough — schema comes from plan
    # analysis (streaming-drain builders do execute, so this test
    # carries most of the file's runtime)
    bad = []
    for name, fn in em.queries().items():
        df = fn(spark, SF)
        for field in df.schema.fields:
            for b in _no_decimal(field.dataType):
                bad.append(f"{name}.{field.name}: {b}")
    assert not bad, f"Spark DecimalType emitters: {bad}"
