"""Typed Arrow-fetch gate replica over the FULL registry at a big
scale tier, batched (r11, VERDICT r10 #2).

The r9 saga proved str() comparison has a blind spot the driver's
typed fetch does not (HUGEINT/DECIMAL normalization); the r10 replica
closed it at sf0.01 and sf0.1, but the sf1.0 tier stayed str()-compare
only. One replica invocation over 220 queries at sf1.0 would exceed
any single-command timeout, so this wrapper runs
tools/driver_gate_replica.py in batches (one Spark session + DuckDB
connection per subprocess — the scale_sweep.py pattern) via its
``only:`` selector and merges the per-batch JSON reports.

Usage: python tools/typed_scale_sweep.py [sf_dir] [out.json] [batch_size]
Exit 1 if any query is RED or a batch dies silently.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
import run_meta


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_big/sf1.0"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "docs/GATE_REPLICA_sf1.0.json"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    names = list(entrymod.queries())
    here = os.path.dirname(os.path.abspath(__file__))
    report: dict[str, dict] = {}
    failures = 0
    for i in range(0, len(names), batch):
        chunk = names[i : i + batch]
        part = tempfile.mktemp(suffix=".json")
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(here, "driver_gate_replica.py"),
                sf_dir,
                str(len(names)),
                part,
                "only:" + ",".join(chunk),
            ],
            capture_output=True,
            text=True,
        )
        got: dict[str, dict] = {}
        if os.path.exists(part):
            with open(part) as f:
                got = json.load(f)
            os.remove(part)
        for name in chunk:
            rec = got.get(name)
            if rec is None:
                # a batch that died without reporting covers NOTHING —
                # count every missing query as red, never skip silently
                rec = {
                    "rows_match": False,
                    "schema_match": False,
                    "hash_match": False,
                    "err": "batch produced no record; stderr tail: "
                    + " | ".join(proc.stderr.strip().splitlines()[-2:]),
                }
            report[name] = rec
            green = (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            )
            if not green:
                failures += 1
                print(f"RED   {name}: {json.dumps(rec)[:200]}", flush=True)
            else:
                print(f"GREEN {name}: {rec.get('spark_rows')} rows", flush=True)
    # provenance header (ADVICE r13 #3) — see tools/run_meta.py
    report_out = {"_meta": run_meta.meta(), **report}
    with open(out_path, "w") as f:
        json.dump(report_out, f, indent=1)
    print(f"typed scale sweep: {len(names) - failures}/{len(names)} green -> {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
