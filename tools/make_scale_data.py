"""Deterministic sf1.0-scale dataset builder: 10x shifted-key
replication of the driver's sf0.1 parquet into testdata_big/sf1.0
(gitignored — ~170 MB, regenerate on demand).

    python tools/make_scale_data.py [src_sf_dir] [factor] [dest_dir]

Scaling model (TPC-H-like): the dimension tables region/nation stay
fixed; every other table is replicated `factor` times with all ids —
primary AND foreign keys — shifted by replica * stride(table), so join
fan-outs, per-key group sizes, and key cardinalities all scale together
the way a genuinely larger dataset's would (10x customers each keeping
the sf0.1 order profile, 10x users with the same session shape, etc.).
Strides are fixed power-of-ten constants larger than any sf1.0 id so
replica key ranges never collide. Timestamps/dates are untouched: the
time range keeps its span and gains 10x density, which is the right
stress for window/sessionization operators (more keys and rows per
frame, not a longer calendar).

DuckDB does the replication (one UNION ALL query per table) and writes
parquet Spark reads directly; list<float> embedding columns round-trip
unchanged.
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> {column: stride} ; every listed column gets `+ replica * stride`
SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 10**9, "c_nationkey": 0},
    "supplier": {"s_suppkey": 10**9, "s_nationkey": 0},
    "part": {"p_partkey": 10**9},
    "orders": {"o_orderkey": 10**12, "o_custkey": 10**9},
    "lineitem": {"l_orderkey": 10**12, "l_partkey": 10**9, "l_suppkey": 10**9},
    "events": {"event_id": 10**12, "user_id": 10**9},
    "documents": {"doc_id": 10**9},
    "embeddings": {"vec_id": 10**9},
}
COPY_ONLY = ["region", "nation"]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dest = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_big",
            "sf1.0",
        )
    )
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, shifts in SHIFTS.items():
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        legs = []
        for i in range(factor):
            proj = ", ".join(
                f"{c} + {i * shifts[c]} AS {c}" if c in shifts and shifts[c] else c
                for c in cols
            )
            legs.append(f"SELECT {proj} FROM '{src}/{t}.parquet'")
        union = "\nUNION ALL\n".join(legs)
        con.execute(f"COPY ({union}) TO '{dest}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dest}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({factor}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
