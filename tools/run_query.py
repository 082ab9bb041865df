"""Run any declared engine query from the command line:

    python tools/run_query.py q5_region_revenue
    python tools/run_query.py bm25_search --sf /root/testdata/sf0.01 --show 50
    python tools/run_query.py q9_product_profit --explain
    python tools/run_query.py --list

--explain prints the plan profile (exchanges / broadcasts / pushdown)
and the formatted physical plan instead of rows."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from advanced_real_time_data_pipeline_and_analytical_processing_spark.plans.explain import profile
from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="query name from queries()")
    ap.add_argument("--sf", default="/root/testdata/sf0.001", help="sf dir")
    ap.add_argument("--show", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="plan, not rows")
    ap.add_argument("--list", action="store_true", help="list query names")
    args = ap.parse_args()

    qs = entrymod.queries()
    if args.list or not args.query:
        for name in qs:
            print(name)
        return
    if args.query not in qs:
        sys.exit(f"unknown query {args.query!r} — see --list")

    spark = get_spark("run-query")
    df = qs[args.query](spark, args.sf)
    if args.explain:
        p = profile(df)
        print(p)
        print(p.plan)
    else:
        t0 = time.perf_counter()
        df.show(args.show, truncate=False)
        print(f"[{time.perf_counter() - t0:.2f}s]")
    spark.stop()


if __name__ == "__main__":
    main()
