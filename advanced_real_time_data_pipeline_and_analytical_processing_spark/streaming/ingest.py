"""Streaming file-ingest pipeline — the reference's core loop, Spark-first.

Reference behavior (``code/Main.py:44-170``): watch a bucket folder,
per micro-batch: read files, clean, validate/split, quarantine bad rows,
enrich good rows, append to serving store, write audit record, move the
consumed files to ``processed/`` (or ``qurantine/`` on failure).

Fixes applied vs the reference (SURVEY.md §4.3):
- §4.3-1 double read: the stream reads the DATA directly
  (``readStream.format('csv'|'json')`` with explicit schema) instead of
  whole-text discovery + batch re-read.
- §4.3-2 unbounded dedup state: the file source's checkpointed
  exactly-once file tracking replaces ``dropDuplicates(file_path)``.
- §4.3-3 action storm: good/bad/total counts come from ``observe()``
  metrics collected during the good-path write — ZERO extra count jobs
  (the reference ran >=12 actions per batch; we run the sink writes plus
  at most one tiny file-list collect over the persisted frame).
- §4.3-6/7: typed empty frames, quarantine keyed by batch + source file
  column rather than comma-joined table names.
- §4.3-8 at-least-once side effects: the good and quarantine sinks are
  written with dynamic-partition-overwrite keyed on ``batch_id`` — a
  replayed micro-batch overwrites exactly its own partition, so the data
  sinks are idempotent under foreachBatch's at-least-once contract. The
  audit sink stays append-only on purpose: it is an attempt log, and a
  replay SHOULD leave a second record.
- K5 file lifecycle (reference ``code/utils.py:48-78``,
  ``code/Main.py:153-156,169``): after a successful batch the consumed
  source files move to ``processed_dir``; if the batch raises they move
  to ``failed_dir``. Implemented with the Hadoop FileSystem API (rename,
  copy+delete fallback semantics on object stores) so the same code
  serves file:// in tests and s3a:// in production. Alternatively the
  source itself can archive via ``clean_source``/``source_archive_dir``
  (Spark's own file-source archiving; note Spark delays archiving a
  batch's files until a later batch commits, so outcome-based routing
  still needs the driver-side move).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from advanced_real_time_data_pipeline_and_analytical_processing_spark.operators.cleaning import clean
from advanced_real_time_data_pipeline_and_analytical_processing_spark.operators.enrichment import row_hash_expr
from advanced_real_time_data_pipeline_and_analytical_processing_spark.operators.validation import (
    ERROR_COL,
    RuleSet,
    validate,
)
from advanced_real_time_data_pipeline_and_analytical_processing_spark.sinks.bootstrap import (
    bootstrap_ingest_dirs,
)
from advanced_real_time_data_pipeline_and_analytical_processing_spark.sinks.writers import (
    AuditRecord,
    write_audit,
)


@dataclass
class IngestConfig:
    source_dir: str
    fmt: str  # "csv" | "json" | "parquet" | "orc" (readStream.format name)
    schema: StructType
    rules: RuleSet
    good_dir: str
    quarantine_dir: str
    audit_dir: str
    checkpoint_dir: str
    max_files_per_trigger: int | None = 1000  # ingest backpressure
    trigger: dict = field(default_factory=lambda: {"availableNow": True})
    # K5 file lifecycle: where consumed source files are moved after the
    # batch. None disables the corresponding move.
    processed_dir: str | None = None
    failed_dir: str | None = None
    # Spark-native source archiving (alternative to the driver-side
    # moves): clean_source in {"archive", "delete"}.
    clean_source: str | None = None
    source_archive_dir: str | None = None
    # K1/K2 composition hook: called once per micro-batch with the
    # enriched GOOD frame (data cols + file_path + ingestion_ts +
    # row_hash) and the batch id, AFTER the parquet good sink — the
    # slot deploy/job_ingest.py uses to add the staged JDBC MERGE
    # (reference Main.py wrote each batch to Postgres). Must be
    # idempotent under foreachBatch's at-least-once replay contract
    # (upsert_jdbc keyed on row_hash is; a blind append is not).
    on_good: Callable[[DataFrame, int], None] | None = None


def build_stream(spark: SparkSession, cfg: IngestConfig) -> DataFrame:
    reader = (
        spark.readStream.format(cfg.fmt)
        .schema(cfg.schema)
        .option("pathGlobFilter", f"*.{cfg.fmt}")
    )
    if cfg.fmt == "csv":
        reader = reader.option("header", "true")
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(cfg.max_files_per_trigger))
    if cfg.clean_source:
        reader = reader.option("cleanSource", cfg.clean_source)
        if cfg.source_archive_dir:
            reader = reader.option("sourceArchiveDir", cfg.source_archive_dir)
    return reader.load(cfg.source_dir)


def move_files(spark: SparkSession, paths: list[str], dest_dir: str | None) -> None:
    """K5: relocate source files into `dest_dir` (reference
    ``code/utils.py:48-78`` did boto3 copy+delete; Hadoop FS ``rename``
    is the portable equivalent — atomic on HDFS/local, copy+delete on
    object stores). Driver-side over file METADATA only: the path list
    is bounded by maxFilesPerTrigger, never row data."""
    if not dest_dir or not paths:
        return
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    dest = HPath(dest_dir)
    fs = dest.getFileSystem(hconf)
    fs.mkdirs(dest)
    for p in paths:
        src = HPath(p)
        src_fs = src.getFileSystem(hconf)
        if src_fs.exists(src):  # replayed batch: file already moved
            src_fs.rename(src, HPath(dest, src.getName()))


def process_batch(cfg: IngestConfig) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: one persisted pass, good/bad split, both sinks
    idempotent on replay, exact audit counts from observe() metrics."""

    def _run(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        data_cols = list(batch_df.columns)
        # file_path is materialized INSIDE the persisted plan: evaluating
        # input_file_name() above a cache returns '' on cache hits.
        marked = (
            validate(clean(batch_df), cfg.rules)
            .withColumn("file_path", F.input_file_name())
            .persist()
        )
        files: list[str] = []
        try:
            # File list for lifecycle routing: prefer the driver-side
            # FileIndex snapshot (no job); fall back to a distinct over
            # the persisted frame (tiny: one row per file).
            files = list(batch_df.inputFiles() or []) or [
                r[0] for r in marked.select("file_path").distinct().collect()
            ]

            obs = Observation()
            observed = marked.observe(
                obs,
                F.count(F.lit(1)).alias("total"),
                F.count(F.when(F.col(ERROR_COL).isNotNull(), F.lit(1))).alias("bad"),
            )
            good = observed.filter(F.col(ERROR_COL).isNull())
            enriched = good.select(
                *data_cols,
                "file_path",
                F.current_timestamp().alias("ingestion_ts"),
                # hash over the DATA columns only (reference recipe,
                # code/helpers.py:208-215) so replays produce identical
                # idempotency keys.
                row_hash_expr(data_cols).alias("row_hash"),
            )
            (
                enriched.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(cfg.good_dir)
            )
            metrics = obs.get  # filled by the write above — no count jobs
            total, bad_count = int(metrics["total"]), int(metrics["bad"])

            if cfg.on_good is not None:
                # K1/K2 slot (e.g. staged JDBC MERGE): recomputes from
                # the persisted `marked`, so no second source scan; the
                # Observation already captured its metrics above.
                cfg.on_good(enriched, batch_id)

            if bad_count:
                (
                    marked.filter(F.col(ERROR_COL).isNotNull())
                    .withColumn(
                        "quarantine_date",
                        F.date_format(F.current_timestamp(), "yyyy-MM-dd"),
                    )
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(cfg.quarantine_dir)
                )
            write_audit(
                spark,
                cfg.audit_dir,
                AuditRecord(
                    batch_id=batch_id,
                    source=cfg.source_dir,
                    fmt=cfg.fmt,
                    total_rows=total,
                    good_rows=total - bad_count,
                    bad_rows=bad_count,
                    status="SUCCESS",
                ),
            )
            move_files(spark, files, cfg.processed_dir)
        except Exception as exc:  # reference T6: failure audit, then re-raise
            write_audit(
                spark,
                cfg.audit_dir,
                AuditRecord(
                    batch_id=batch_id,
                    source=cfg.source_dir,
                    fmt=cfg.fmt,
                    total_rows=0,
                    good_rows=0,
                    bad_rows=0,
                    status="FAILURE",
                    message=str(exc)[:500],
                ),
            )
            move_files(spark, files, cfg.failed_dir)
            raise
        finally:
            marked.unpersist()

    return _run


def start_ingest(spark: SparkSession, cfg: IngestConfig):
    """Start the streaming query. With trigger=availableNow this drains
    the existing backlog and stops (backfill mode); with processingTime
    it runs continuously (reference T1). Storage locations are
    bootstrapped first (K6 — the reference's ``initialize_bucket`` at
    ``code/Main.py:34`` holds the same pre-stream slot)."""
    bootstrap_ingest_dirs(spark, cfg)
    stream = build_stream(spark, cfg)
    writer = (
        stream.writeStream.foreachBatch(process_batch(cfg))
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(**cfg.trigger)
    )
    return writer.start()


def run_ingest_once(spark: SparkSession, cfg: IngestConfig) -> None:
    """Synchronous availableNow drain (used by tests/backfills)."""
    cfg.trigger = {"availableNow": True}
    q = start_ingest(spark, cfg)
    q.awaitTermination()


def start_multi_format_ingest(
    spark: SparkSession, cfgs: list[IngestConfig]
) -> list:
    """Reference S7 (format dispatch, ``code/Main.py:76-80``) done the
    Spark way: the reference collected each batch's file paths to the
    driver and grouped them by extension with RDD ops; here each format
    is its own streaming query over the same directory (pathGlobFilter
    separates them at the source), so schemas are fixed at plan time and
    nothing moves driver-side. Queries run concurrently and share
    nothing but the directory."""
    return [start_ingest(spark, cfg) for cfg in cfgs]


def run_multi_format_once(spark: SparkSession, cfgs: list[IngestConfig]) -> None:
    """availableNow drain of every per-format stream (test/backfill)."""
    for cfg in cfgs:
        cfg.trigger = {"availableNow": True}
    for q in start_multi_format_ingest(spark, cfgs):
        q.awaitTermination()
