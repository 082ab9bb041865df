"""Registry-wide oracle emission-type lint (r9, VERDICT r8 #3).

The r8 probe decode proved the seven-round driver-red pair was caused
by the harness's value normalization of oracle output types that
Spark never emits: DuckDB promotes sum(BIGINT) to HUGEINT (INT128)
and exact sums to DECIMAL(38,0); under Arrow/pandas those normalize
differently than int64 even when every value is equal. Local string
comparison masks it. This lint makes the class extinct: every
oracle_sql() entry must emit ONLY Spark-emittable types.

Usage: python tools/lint_oracle_types.py [sf_dir]
Prints one line per offending column; exit 1 if any.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from advanced_real_time_data_pipeline_and_analytical_processing_spark.catalog import TABLES

# What Spark emits through the driver's Arrow/pandas fetch: 64-bit-or-
# narrower integers, strings, doubles/floats, dates, timestamps,
# booleans, and lists/structs thereof. HUGEINT and DECIMAL(p,s) are
# DuckDB-only widths with engine-specific normalization — banned.
_ALLOWED_SCALAR = re.compile(
    r"^(BIGINT|INTEGER|INT|SMALLINT|TINYINT|VARCHAR|DOUBLE|FLOAT|DATE"
    r"|TIMESTAMP( WITH TIME ZONE)?|BOOLEAN|BLOB)$"
)


def type_ok(t: str) -> bool:
    t = t.strip()
    while t.endswith("[]"):  # list of allowed scalar is allowed
        t = t[:-2]
    if t.startswith("STRUCT(") and t.endswith(")"):
        # split top-level fields: "name TYPE, name TYPE"
        depth, start, parts = 0, 7, []
        for i, ch in enumerate(t[7:-1], 7):
            if ch in "(<[":
                depth += 1
            elif ch in ")>]":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(t[start:i])
                start = i + 1
        parts.append(t[start:-1])
        return all(type_ok(p.strip().split(" ", 1)[1]) for p in parts)
    return bool(_ALLOWED_SCALAR.match(t))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = 0
    for name, sql in entrymod.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERR  {name}: describe failed: {str(e)[:160]}")
            bad += 1
            continue
        for col, typ, *_ in desc:
            if not type_ok(typ):
                print(f"BAD  {name}.{col}: {typ}")
                bad += 1
    print(f"lint_oracle_types: {bad} offending columns")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
