"""Decode the r8 row-count probe channel (RETIRED r9 — historical).

The probe served its purpose: the r8 decode proved both per-primitive
checksums agree across engines, root-causing the seven-round red pair
as harness normalization of HUGEINT/DECIMAL oracle output types
(post-mortem: docs/QUERIES.md §probe). The channel was stripped from
both query slots in r9; this tool remains to decode the archived
CORRECTNESS_r08.json.

The two six-round-red gate rows (`rolling_7day_revenue`,
`json_props_stats`) UNION ALL a marker block of
`c = c_a + 101*c_b + 9797*vcode` rows onto their unchanged base
result, computed independently by each engine over its own base rows.
Given a CORRECTNESS_r*.json, this decodes each engine's version code
and both checksums from the raw spark_rows/oracle_rows integers, and
names the diverging primitive.

Base row counts are pinned from six rounds of driver history
(CORRECTNESS_r02..r07): rolling_7day_revenue = 2399,
json_props_stats = 5. If a decoded version code falls outside [0,14]
the base drifted — fall back to difference analysis by hand.

Usage: python tools/decode_probe.py CORRECTNESS_r08.json
"""

from __future__ import annotations

import json
import sys

BASES = {"rolling_7day_revenue": 2399, "json_props_stats": 5}
CHECKS = {
    "rolling_7day_revenue": (
        "c_a=pmod(sum(rev_cents),101) [daily agg/cents parse]",
        "c_b=pmod(sum(rolling_7d_cents),97) [window frame]",
        "day-string formatting or harness value normalization",
    ),
    "json_props_stats": (
        "c_a=pmod(sum(sum_k),101) [regex parse + sum]",
        "c_b=pmod(sum(avg_k_micro),97) [exact DECIMAL floor-division]",
        "DECIMAL(38,0) harness value normalization",
    ),
}
SPARK_VCODES = {4: "3.5", 5: "4.0", 6: "4.1", 7: "4.2", 8: "4.3", 9: "4.4+"}
DUCK_VCODES = {i: f"1.{i}" for i in range(10)} | {10 + i: f"2.{i}" for i in range(4)}


def unpack(c: int) -> tuple[int, int, int]:
    return c % 101, (c % 9797) // 101, c // 9797


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r08.json"
    data = json.load(open(path))
    for name, base in BASES.items():
        rec = data.get(name)
        if rec is None:
            print(f"{name}: not in {path}")
            continue
        sr, orc = rec["spark_rows"], rec["oracle_rows"]
        cs, co = sr - base, orc - base
        if cs < 0 or co < 0:
            print(f"{name}: counts below pinned base ({sr}/{orc} vs {base}) — "
                  "probe not in the checked tree or base drifted")
            continue
        (sa, sb, sv), (da, db, dv) = unpack(cs), unpack(co)
        desc_a, desc_b, desc_none = CHECKS[name]
        print(f"{name}: spark_rows={sr} oracle_rows={orc} base={base}")
        print(f"  spark: c_a={sa} c_b={sb} vcode={sv} "
              f"(Spark {SPARK_VCODES.get(sv, f'code {sv}')})"
              + ("  [vcode out of range — base drifted?]" if sv > 14 else ""))
        print(f"  duck : c_a={da} c_b={db} vcode={dv} "
              f"(DuckDB {DUCK_VCODES.get(dv, f'code {dv}')})"
              + ("  [vcode out of range — base drifted?]" if dv > 14 else ""))
        if sa != da:
            print(f"  => DIVERGES at {desc_a}")
        elif sb != db:
            print(f"  => c_a agrees; DIVERGES at {desc_b}")
        else:
            print(f"  => both checksums agree; divergence is {desc_none}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
