"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what a production cluster submit would set:
AQE on (runtime shuffle coalescing, skew-join handling, dynamic join
selection), Arrow for pandas boundaries, UTC session timezone (required
for DuckDB-oracle comparability), shuffle partitions sized to cores
rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "artdpap-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    On a real cluster the master/memory settings come from spark-submit;
    everything set here is master-agnostic except ``local[N]``.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # `spark.driver.memory` set through builder.config is SILENTLY
    # IGNORED when the JVM is launched from a plain Python process (the
    # gateway starts before the conf applies). To actually size the
    # local-mode heap, set SPARK_DRIVER_MEMORY and we inject it at JVM
    # launch via PYSPARK_SUBMIT_ARGS. Opt-in only: measured on this
    # suite, big heaps (16-48g) run SLOWER than the compact default
    # (worse locality, larger G1 regions) — don't "fix" what profiling
    # says isn't broken.
    mem = os.environ.get("SPARK_DRIVER_MEMORY")
    if (
        mem
        and "PYSPARK_SUBMIT_ARGS" not in os.environ
        and SparkSession.getActiveSession() is None
    ):
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4 defaults ANSI ON; the engine's semantics (and every
        # oracle comparison) are defined with ANSI off. configure_session
        # pins this for driver-provided sessions — pin it here too so
        # local pytest / direct-operator sessions run under the SAME
        # overflow/cast semantics as the gate (VERDICT r6 #2).
        .config("spark.sql.ansi.enabled", "false")
        # size(NULL) = NULL (SQL / DuckDB len() semantics), not the
        # legacy -1 the non-ANSI default resurrects — a NULL text row
        # must profile as NULL tokens, not -1 tokens
        .config("spark.sql.legacy.sizeOfNull", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", mem or "8g")  # cluster-submit path only
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # Scale-dependent overrides without code edits (optimization guide
    # §9: configs are deployment-specific): SPARK_GRAFT_CONF holds
    # ;-separated key=value pairs applied LAST, so a cluster submit (or
    # an A/B probe) can tune shuffle codec, join strategy, partition
    # sizing etc. while local defaults stay fixed and bench-comparable.
    # Caveats (ADVICE r14): env pairs OVERRIDE a caller's extra_conf on
    # key collision (deployment beats code — by design); values cannot
    # contain ';'; and like extra_conf they are builder-time configs, so
    # a pre-existing session returned by getOrCreate() ignores them
    # (only the runtime-settable ANSI/sizeOfNull pins below re-apply).
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    pairs = dict(
        p.split("=", 1) for p in env_conf.split(";") if "=" in p
    )
    for k, v in {**(extra_conf or {}), **pairs}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may hand back a pre-existing session whose builder
    # configs never applied; ANSI is runtime-settable, so pin it
    # unconditionally — both factory paths must agree with the gate.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine configs to an externally provided
    session (the driver hands us one; master/memory are fixed by then)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Spark 4 defaults ANSI mode ON; under ANSI a no-match
    # regexp_extract '' -> CAST(... AS BIGINT) raises instead of
    # yielding NULL, and integer overflow errors instead of wrapping.
    # The engine's semantics (and every oracle comparison) are defined
    # with ANSI off; the conf is runtime-settable, so pin it here to
    # neutralize whatever session the driver hands us.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # size(NULL) = NULL, matching DuckDB len(NULL) — see get_spark
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # testdata events.parquet stores ts as TIMESTAMP(NANOS); Spark has no
    # nanos timestamp type — read as long and convert at the catalog layer.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    return spark
