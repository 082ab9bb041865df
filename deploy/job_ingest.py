"""Cluster job entrypoint — the reference ``code/Main.py`` slot,
submitted by ``deploy/submit.sh`` (R4) the way the reference's
``start.sh:36`` ran ``spark-submit /home/spark/main.py`` inside its
compose stack (R3).

Environment surface mirrors the reference's compose service env
(``docker-compose.yml:55-62``): BUCKET_NAME, DB_URL, DB_USER,
DB_PASSWORD, TRIGGER_INTERVAL_SEC. Object-store endpoint/credentials
come from ``deploy/spark-submit.conf`` (``spark.hadoop.fs.s3a.*``),
NOT from here — the session arrives from spark-submit fully built, so
this job only applies the engine's runtime-settable requirements via
``configure_session`` and composes operators, exactly as
``docs/CLUSTER.md`` prescribes.

Pipeline = the reference's end-to-end shape re-expressed Spark-first:
K6 layout bootstrap → per-format streaming ingest (S1–S7) with the
typed rule engine (P1–P7) splitting good/quarantine, observe()-exact
audit (K4/A6), processed-file moves (K5) — all inside
``streaming.ingest`` — supervised with checkpoint restarts (T5/T6),
and the good stream upserted to the warehouse per micro-batch via the
staged JDBC MERGE (K1/K2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from advanced_real_time_data_pipeline_and_analytical_processing_spark.operators.validation import (
    reference_ruleset,
)
from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import (
    configure_session,
)
from advanced_real_time_data_pipeline_and_analytical_processing_spark.sinks.bootstrap import (
    initialize_layout,
)
from advanced_real_time_data_pipeline_and_analytical_processing_spark.sources.schema_registry import (
    load_schema_any,
)
from advanced_real_time_data_pipeline_and_analytical_processing_spark.streaming.ingest import (
    IngestConfig,
    start_ingest,
)
from advanced_real_time_data_pipeline_and_analytical_processing_spark.streaming.supervision import (
    run_supervised,
)


def build_configs(spark: SparkSession, base: str, trigger_s: int) -> list[IngestConfig]:
    """One streaming query per source format over the bucket's data/
    prefix (S7 dispatch); schemas come from the schema/ prefix, the
    reference's dynamic-schema slot (S6, ref Main.py:92-101)."""
    layout = initialize_layout(spark, base)  # K6, idempotent
    cfgs = []
    for fmt in ("csv", "json"):
        schema = load_schema_any(spark, layout["schema"], f"sensors.{fmt}")
        if schema is None:
            continue  # no registered schema for this format yet
        cfgs.append(
            IngestConfig(
                source_dir=layout["data"],
                fmt=fmt,
                schema=schema,
                rules=reference_ruleset(),
                good_dir=f"{layout['']}/good_{fmt}",
                quarantine_dir=f"{layout['quarantine']}/{fmt}",
                audit_dir=f"{layout['audit']}/{fmt}",
                checkpoint_dir=f"{layout['']}/checkpoints/{fmt}",
                processed_dir=layout["processed"],
                trigger={"processingTime": f"{trigger_s} seconds"},
            )
        )
    return cfgs


def main() -> None:
    spark = configure_session(SparkSession.builder.getOrCreate())
    base = os.environ["BUCKET_NAME"]  # e.g. s3a://my-bucket
    trigger_s = int(os.environ.get("TRIGGER_INTERVAL_SEC", "60"))
    cfgs = build_configs(spark, base, trigger_s)
    if not cfgs:
        raise SystemExit(
            f"no schemas registered under {base}/schema — upload with "
            "deploy/upload_data.py before submitting"
        )
    # T5/T6: each format's query runs under its own supervision loop
    # (run_supervised restarts from the checkpoint with bounded
    # backoff), one thread per format since the queries are concurrent
    # — the S7 dispatch shape of start_multi_format_ingest, made
    # individually restartable.
    import threading

    threads = [
        threading.Thread(
            target=run_supervised,
            args=(lambda c=cfg: start_ingest(spark, c),),
            name=f"supervise-{cfg.fmt}",
        )
        for cfg in cfgs
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()


if __name__ == "__main__":
    main()
