"""SPARK_GRAFT_DURABLE switch: localCheckpoint vs persist(DISK_ONLY).

On a cluster with executor churn, localCheckpoint blocks die with
their executor; docs/CLUSTER.md prescribes persist(DISK_ONLY). The
switch makes that substitution code, not prose: every lineage-cut in
the engine routes through plans.materialize.materialize().
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from advanced_real_time_data_pipeline_and_analytical_processing_spark.plans.materialize import (
    durable_mode,
    materialize,
)


def test_default_is_local_checkpoint(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DURABLE", raising=False)
    assert not durable_mode()
    df = materialize(spark.range(10).withColumn("x", F.col("id") * 2))
    # localCheckpoint truncates lineage to an RDD scan
    assert "Scan ExistingRDD" in df._jdf.queryExecution().toString()
    assert df.count() == 10


def test_durable_mode_persists_disk_only(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DURABLE", "1")
    assert durable_mode()
    df = materialize(spark.range(10).withColumn("x", F.col("id") * 2))
    try:
        assert df.storageLevel == StorageLevel.DISK_ONLY
        assert df.count() == 10
    finally:
        df.unpersist()


def test_durable_eager_materializes_now(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DURABLE", "1")
    df = materialize(spark.range(100), eager=True)
    try:
        # eager persist must have computed the cache already
        info = [
            r
            for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if r.numCachedPartitions() > 0
        ]
        assert info, "eager durable materialize left nothing cached"
    finally:
        df.unpersist()


def test_same_values_both_modes(spark, monkeypatch):
    base = spark.range(50).withColumn("g", F.col("id") % 5)
    monkeypatch.delenv("SPARK_GRAFT_DURABLE", raising=False)
    a = sorted(map(tuple, materialize(base).groupBy("g").count().collect()))
    monkeypatch.setenv("SPARK_GRAFT_DURABLE", "1")
    df = materialize(base)
    try:
        b = sorted(map(tuple, df.groupBy("g").count().collect()))
    finally:
        df.unpersist()
    assert a == b


def test_operators_run_durable_end_to_end(spark, monkeypatch):
    """Operators that route lineage cuts through materialize() must
    produce identical results in durable mode — run the iterative
    cluster propagation (most materialize-dependent operator: eager
    per-round cuts) and the minhash pipeline both ways."""
    from pyspark.sql import Row

    from advanced_real_time_data_pipeline_and_analytical_processing_spark.operators import dedup

    rows = [Row(doc_id=i, text=f"chain doc {i // 3} shared body words here") for i in range(30)]
    df = spark.createDataFrame(rows)

    def run():
        pairs = dedup.minhash_near_dup(
            df, "doc_id", "text", num_hashes=16, bands=4, threshold=0.9
        )
        edges = pairs.select("id_a", "id_b")
        clusters = dedup.duplicate_clusters(
            edges, df.select("doc_id"), "doc_id"
        )
        return sorted(map(tuple, clusters.collect()))

    monkeypatch.delenv("SPARK_GRAFT_DURABLE", raising=False)
    local = run()
    monkeypatch.setenv("SPARK_GRAFT_DURABLE", "1")
    try:
        durable = run()
    finally:
        for (_, rdd) in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()
    assert local == durable
    assert len(local) == 30  # every doc labeled
