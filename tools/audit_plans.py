"""Physical-plan audit over every declared query: exchange count,
broadcast count, parquet filter pushdown — the at-a-glance view of
shuffle discipline. Run after adding or changing a query:

    python tools/audit_plans.py [sf_dir] [query ...]

A query whose exchange count jumps unexpectedly, or whose broadcast
count drops to zero on a dimensional join, regressed — find out why
before benching."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from advanced_real_time_data_pipeline_and_analytical_processing_spark.plans.explain import profile
from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import get_spark

# streaming-execution queries run a real stream on build — skip their
# plan here (their micro-batch plans are visible in the Spark UI)
STREAMING = {
    "stateful_running_counts",
    "stream_stream_join",
    "stream_outer_join_report",
    "streaming_upsert",
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)] or list(
        entrymod.queries().keys()
    )
    spark = get_spark("plan-audit", cpus="8", shuffle_partitions=8)
    qs = entrymod.queries()
    print(f"{'query':32s} {'exch':>4} {'bcast':>5} {'pushed':>6}")
    for name in names:
        if name in STREAMING:
            print(f"{name:32s} {'-':>4} {'-':>5} {'-':>6}  (streaming)")
            continue
        p = profile(qs[name](spark, sf_dir))
        print(
            f"{name:32s} {p.exchanges:>4} {p.broadcasts:>5} "
            f"{p.pushed_filter_scans:>6}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
