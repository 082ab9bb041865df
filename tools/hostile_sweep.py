"""Hostile-session sweep of the gated head (first 50 registry entries).

The external gate runs the head queries in ITS OWN SparkSession; this
tool replays the whole head in the most hostile session a driver
plausibly builds — non-UTC timezone, parquet NTZ inference off, ANSI
ON (the Spark 4 default) — and exact-compares every query against its
DuckDB oracle, proving `configure_session`'s runtime rescue covers the
full gated surface, not just the five queries pinned in
tests/test_hostile_env.py.

Usage: python tools/hostile_sweep.py [sf_dir] [n_head]

Static confs (timezone default, NTZ inference) must be set before the
JVM exists, so run this in a fresh process — it builds its own hostile
session.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession


def norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_head = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as entrymod
    from advanced_real_time_data_pipeline_and_analytical_processing_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    head = list(queries)[:n_head]
    failures = 0
    for name in head:
        try:
            sdf = queries[name](spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm(r[c]) for c in cols) for r in sdf.collect()
            )
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(srows)} rows")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        idx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        orows = sorted(
            tuple(norm(r[i]) for i in idx) for r in cur.fetchall()
        )
        if sorted(ocols) != cols:
            print(f"FAIL {name}: columns spark={cols} duck={sorted(ocols)}")
            failures += 1
        elif srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:2]
            print(f"FAIL {name}: values differ: {diff}")
            failures += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
    spark.stop()
    print(f"hostile sweep: {len(head) - failures}/{len(head)} clean")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
