"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry against its oracle_sql() in
DuckDB at the given sf dir; compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import atexit
import math
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from advanced_real_time_data_pipeline_and_analytical_processing_spark.catalog import TABLES
from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import get_spark


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # exact — catches last-ulp round() divergence
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    # Per-process spill dir: DuckDB's in-memory default is ./.tmp, and two
    # concurrent sweep processes in the same cwd corrupt each other's
    # temp_storage files (observed 2026-08-16 at sf1.0: IOException mid-spill).
    # mkdtemp (not cwd/pid) so repeated runs leave no stale dirs and pid
    # reuse can never resurrect one; removed on exit.
    spill = tempfile.mkdtemp(prefix="duckspill-oracle-")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    con.execute(f"SET temp_directory = '{spill}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(spark_rows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        sc, sr = norm_rows(spark_cols, [tuple(r) for r in spark_rows])
        dc, dr = norm_rows(duck_cols, duck_rows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            failures += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            failures += 1
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diff}")
            failures += 1
        else:
            print(f"PASS {name}: {len(sr)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
