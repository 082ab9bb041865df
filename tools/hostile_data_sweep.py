"""Hostile-DATA sweep: full registry Spark-vs-DuckDB on the hostile
fixture (VERDICT r6 next-round #3 — the systemic fix).

`tools/hostile_sweep.py` hardens against hostile SESSION configs; this
is its data twin. `tools/make_hostile_data.py` derives a fixture with
NULLs in every nullable column, NaN/±Inf doubles, int64-edge numerics,
hostile `props` encodings, and empty strings; this tool runs EVERY
oracle-checkable registry query on it and classifies each divergence:

  spark-err   Spark raised (engine not hostile-input-safe)
  oracle-err  DuckDB raised where Spark returned rows (the
              error-vs-NULL cast asymmetry class)
  cols/rows   shape divergence
  values      the silent channel — the exact red-gate signature
  PASS        engines agree bit-for-bit on hostile data

Engine-default asymmetries can never hide behind benign fixtures again:
run this after touching any query or oracle.

Usage: python tools/hostile_data_sweep.py [fixture_dir] [query ...]
       (default fixture: /root/repo/testdata_hostile; regenerate it
        first with tools/make_hostile_data.py)
Writes docs/HOSTILE_DATA_SWEEP.json and prints a summary.
"""

from __future__ import annotations

import atexit
import json
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import duckdb

import run_meta

import __spark_entry__ as entrymod
from advanced_real_time_data_pipeline_and_analytical_processing_spark.catalog import TABLES
from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import (
    configure_session,
    get_spark,
)


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_hostile"
    only = set(sys.argv[2:])
    spark = configure_session(get_spark("hostile-data", cpus=8, shuffle_partitions=8))
    con = duckdb.connect()
    # Per-process spill dir: DuckDB's in-memory default is ./.tmp, and two
    # concurrent sweep processes in the same cwd corrupt each other's
    # temp_storage files (observed 2026-08-16 at sf1.0: IOException mid-spill).
    # mkdtemp (not cwd/pid) so repeated runs leave no stale dirs and pid
    # reuse can never resurrect one; removed on exit.
    spill = tempfile.mkdtemp(prefix="duckspill-hostile-")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    con.execute(f"SET temp_directory = '{spill}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    report: dict[str, dict] = {}
    counts = {"PASS": 0, "spark-err": 0, "oracle-err": 0, "cols": 0, "rows": 0, "values": 0, "rows-only": 0}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        entry: dict = {}
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
        except Exception as e:
            entry = {"status": "spark-err", "detail": str(e)[:400]}
            report[name] = entry
            counts["spark-err"] += 1
            print(f"SPARK-ERR  {name}: {str(e)[:160]}")
            continue
        if name not in oracles:
            report[name] = {"status": "rows-only", "n": len(spark_rows)}
            counts["rows-only"] += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            entry = {"status": "oracle-err", "detail": str(e)[:400]}
            report[name] = entry
            counts["oracle-err"] += 1
            print(f"ORACLE-ERR {name}: {str(e)[:160]}")
            continue
        sc, sr = norm_rows(spark_cols, spark_rows)
        dc, dr = norm_rows(duck_cols, duck_rows)
        if sc != dc:
            entry = {"status": "cols", "spark": sc, "duck": dc}
            counts["cols"] += 1
            print(f"COLS       {name}: {sc} vs {dc}")
        elif len(sr) != len(dr):
            entry = {"status": "rows", "spark": len(sr), "duck": len(dr)}
            counts["rows"] += 1
            print(f"ROWS       {name}: {len(sr)} vs {len(dr)}")
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            entry = {"status": "values", "first_diffs": [[list(a), list(b)] for a, b in diff]}
            counts["values"] += 1
            print(f"VALUES     {name}: {diff[:1]}")
        else:
            entry = {"status": "PASS", "n": len(sr)}
            counts["PASS"] += 1
        report[name] = entry
    spark.stop()
    summary = {
        "_meta": run_meta.meta(),  # provenance (ADVICE r13 #3)
        "fixture": sf_dir,
        "counts": counts,
        "queries": report,
    }
    if not only:
        tag = os.path.basename(sf_dir.rstrip("/"))
        with open(f"/root/repo/docs/HOSTILE_DATA_SWEEP_{tag}.json", "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
    print("hostile-data sweep:", json.dumps(counts))
    bad = sum(v for k, v in counts.items() if k not in ("PASS", "rows-only"))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
