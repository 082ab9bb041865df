"""Scale-stability sweep: run the full oracle gate at sf0.1 in
timeout-safe batches (one Spark session per batch keeps any single
invocation under the driver's per-command limits).

    python tools/scale_sweep.py [sf_dir] [batch_size]

r11: sweeps the FULL registry — no exclusions. The three formerly
brute-force quadratic DuckDB oracles (minhash_near_dup,
ngram_jaccard_pairs, media_phash_pairs) were rewritten in round 11 as
lossless candidate+verify SQL (prefix filtering / pigeonhole banding —
see their oracle_sql comments in __spark_entry__.py), so every oracle
now runs at every scale tier. This sweep is what catches
partition-order float drift that the smaller gate can miss (see
verify SKILL.md)."""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    names = list(entrymod.queries())
    here = os.path.dirname(os.path.abspath(__file__))
    failures = 0
    for i in range(0, len(names), batch):
        chunk = names[i : i + batch]
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "check_oracle.py"), sf_dir, *chunk],
            capture_output=True,
            text=True,
        )
        seen = 0
        batch_failed = False
        for line in proc.stdout.splitlines():
            # Spark progress bars glue \r fragments onto result lines —
            # match anywhere in the line, not just at the start
            for tag in ("PASS ", "FAIL ", "ok?  "):
                idx = line.find(tag)
                if idx >= 0:
                    print(line[idx:])
                    seen += 1
                    if tag == "FAIL ":
                        failures += 1
                        batch_failed = True
        # A subprocess that dies without printing (OOM, timeout, import
        # error) must count as failed for its WHOLE batch — a silent
        # skip would report 0 failures while covering nothing.
        if proc.returncode != 0 and not batch_failed:
            print(
                f"FAIL batch {chunk}: check_oracle exited "
                f"{proc.returncode} without FAIL lines; stderr tail: "
                f"{proc.stderr.strip().splitlines()[-3:]}"
            )
            failures += 1
        elif seen < len(chunk):
            missing = len(chunk) - seen
            print(f"FAIL batch {chunk}: {missing} queries produced no result line")
            failures += missing
    print(f"swept {len(names)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
