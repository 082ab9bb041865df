"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Times are end-to-end per query (plan + execute + collect) after a JVM
warmup action, which is what a user of the engine actually waits for.

Modes:
  python bench.py                 shared-JVM suite (the default; fast,
                                  but numbers can swing +/-30% when a
                                  prior JVM is dying on the same box)
  python bench.py --isolate       one FRESH JVM per query (each child
                                  warms up, times one query, exits) —
                                  slower wall-clock, but every number
                                  is a clean-room measurement suitable
                                  for round-over-round comparison.
                                  Honors SPARK_GRAFT_QUERIES to subset.
  python bench.py --isolate --reps N
                                  N timed runs per query inside the
                                  query's fresh JVM; per-query value is
                                  the MEDIAN and the artifact keeps the
                                  raw reps. The box swings 4-6x per
                                  single run (docs/BENCH_NOTES.md r7);
                                  medians stop phantom regressions.
  python bench.py --single NAME   internal: child process of --isolate.

The emitted JSON carries "mode": "shared" | "isolate" so artifacts are
self-describing.
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import get_spark


def _reps_arg() -> int:
    if "--reps" in sys.argv:
        return max(1, int(sys.argv[sys.argv.index("--reps") + 1]))
    return 1


def _isolate() -> None:
    """One fresh JVM per query: spawn `bench.py --single NAME` children
    sequentially and aggregate their timings into the standard one-line
    artifact. Every measurement starts from a cold, clean JVM. With
    --reps N each child times the query N times (post-warmup, cache
    cleared between reps) and the per-query value is the median — the
    r7->r8 protocol fix for the 4-6x single-run box swings."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    only = {n for n in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",") if n}
    names = [n for n in entrymod.queries() if not only or n in only]
    n_reps = _reps_arg()
    timings: dict[str, float] = {}
    raw_reps: dict[str, list[float]] = {}
    for name in names:
        try:
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--single",
                    name,
                    "--reps",
                    str(n_reps),
                ],
                capture_output=True,
                text=True,
                timeout=600,
            )
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            timings[name] = rec["sec"]
            raw_reps[name] = rec.get("reps", [rec["sec"]])
        except Exception as exc:  # timing artifact must not die mid-suite
            print(f"isolate: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
            raw_reps[name] = []
    ok = {k: v for k, v in timings.items() if v >= 0}
    # "value" sums only succeeded queries; n_failed makes a partial
    # artifact self-describing so bench_diff can refuse/adjust instead
    # of comparing totals over different query sets.
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(ok.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "mode": "isolate",
                "n_failed": len(timings) - len(ok),
                "n_reps": n_reps,
                "reps": raw_reps,
            }
        )
    )


def _single(name: str) -> None:
    """Child of --isolate: warm up this JVM, time ONE query --reps
    times (median reported as "sec", raw runs as "reps"), print one
    JSON record."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_reps = _reps_arg()
    spark = get_spark("bench-single", cpus=cpus, shuffle_partitions=int(cpus))
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(int(cpus) * 10).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).collect()
    fn = entrymod.queries()[name]
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR",
        os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001"),
    )
    if os.path.isdir(warm_dir):
        try:
            fn(spark, warm_dir).collect()
        except Exception:
            pass
        spark.catalog.clearCache()
    reps: list[float] = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        reps.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    med = sorted(reps)[len(reps) // 2] if len(reps) % 2 else round(
        (sorted(reps)[len(reps) // 2 - 1] + sorted(reps)[len(reps) // 2]) / 2, 3
    )
    print(json.dumps({"name": name, "sec": med, "reps": reps}))
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        "bench",
        cpus=cpus,
        shuffle_partitions=int(cpus),
        # default 100-entry codegen class cache evicts the warmup
        # pass's compiled classes before the timed pass reuses them
        # (110 queries x several codegen stages each); size it to hold
        # the whole suite so warmup JIT actually transfers
        extra_conf={"spark.sql.codegen.cache.maxEntries": "5000"},
    )

    # JVM/codegen warmup so the first timed query isn't paying startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Arrow/pandas worker-pool warmup (workers are reused across
    # queries; a long-lived engine always runs warm): one trivial
    # mapInPandas task per core so the first Arrow query isn't timing
    # Python interpreter spawns.
    spark.range(int(cpus) * 10).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).collect()
    # Full-suite warmup at the smallest scale: each query's first run
    # pays a one-time, data-size-INDEPENDENT JIT/class-load cost (the
    # array-hash-heavy plans pay ~10 s at sf0.001 and sf0.1 alike; the
    # rerun then takes 3-4 s at sf0.1). A tiny untimed pass compiles
    # every plan's generated class once, so the timed pass below
    # measures steady-state engine throughput, not JVM warmup.
    # Optional subset (comma-separated names) — used by the sf1.0 scale
    # sweep to time just the most expensive queries at 10x data.
    only = {
        n for n in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",") if n
    }
    to_run = {
        name: fn
        for name, fn in entrymod.queries().items()
        if not only or name in only
    }
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR",
        os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001"),
    )
    if os.path.isdir(warm_dir):
        for name, fn in to_run.items():
            try:
                fn(spark, warm_dir).collect()
            except Exception:
                pass  # warmup only — the timed pass surfaces real failures
            spark.catalog.clearCache()
    timings: dict[str, float] = {}
    for i, (name, fn) in enumerate(to_run.items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        # drop finished queries' cached/checkpointed blocks so later
        # queries aren't timed under earlier queries' memory pressure
        # (a long-lived engine does the same housekeeping); GC kick
        # lets the ContextCleaner release localCheckpoint RDD blocks
        spark.catalog.clearCache()
        if i % 20 == 19:
            # Python-side collect first: py4j proxies pin JVM-side
            # DataFrame/RDD handles (localCheckpoint blocks, broadcast
            # refs) until Python GC detaches them — System.gc() alone
            # can't release what the gateway still references. Kept
            # PERIODIC: a full gc.collect() costs ~0.3 s against this
            # process's object graph, so per-query it taxes the suite
            # ~50 s (measured) for no added release.
            gc.collect()
            spark._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "mode": "shared",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if "--isolate" in sys.argv:
        _isolate()
    elif "--single" in sys.argv:
        _single(sys.argv[sys.argv.index("--single") + 1])
    else:
        main()
