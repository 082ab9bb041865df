"""Storage-layout bootstrap (reference K6, ``code/utils.py:14-46``).

The reference creates a MinIO bucket plus the pipeline's folder prefixes
(``data processed audit qurantine schema`` — its spelling, preserved at
the call site ``code/Main.py:34``) with boto3 on the driver. This is the
storage-agnostic equivalent over Hadoop's FileSystem API, so the same
call works on local paths in the sandbox and on s3a:///abfs:///hdfs://
URIs on a cluster — idempotent like the original (create-if-missing,
existing dirs untouched).

Driver-side setup, not a dataflow op: runs once before the streaming
ingest starts (streaming/ingest.py expects these subdirs).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# the reference's folder set, reference spelling preserved
# (``code/Main.py:34`` — 'qurantine' [sic])
DEFAULT_FOLDERS = ["data", "processed", "audit", "qurantine", "schema"]


def bootstrap_layout(
    spark: SparkSession,
    base: str,
    folders: list[str] | None = None,
) -> list[str]:
    """Create ``base`` and its pipeline subfolders if missing.

    Returns the list of URIs that exist after the call. Uses the JVM
    Hadoop FileSystem bound to the session config, so credentials /
    endpoints come from the same place the data paths use — no second
    (boto3-style) client with its own config to drift, which is the
    reference's shape (``code/utils.py:23-29`` builds a separate s3
    client from env vars the Spark config duplicates).
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    out = []
    for sub in [""] + list(DEFAULT_FOLDERS if folders is None else folders):
        path_str = base.rstrip("/") + (f"/{sub}" if sub else "")
        path = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = path.getFileSystem(conf)
        if not fs.exists(path):
            fs.mkdirs(path)
        out.append(path_str)
    return out
