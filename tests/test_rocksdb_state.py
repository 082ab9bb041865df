"""RocksDB state store: the 100 TB streaming-state path, tested locally.

docs/CLUSTER.md prescribes RocksDB for large streaming state (HDFS-
backed in-memory state OOMs when keys no longer fit on the heap). The
rocksdbjni jar ships inside pyspark, so the provider is runnable in
local mode — these tests run the SAME stateful aggregation under the
default provider and under RocksDB and assert identical results, which
upgrades the cluster-conf claim from prose to tested behavior.

The provider class is fixed per streaming query from the SQL conf at
query start; it is set per-test and restored after.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_conf(spark):
    old = spark.conf.get(PROVIDER_KEY, None)
    spark.conf.set(PROVIDER_KEY, ROCKSDB)
    yield
    if old is None:
        spark.conf.unset(PROVIDER_KEY)
    else:
        spark.conf.set(PROVIDER_KEY, old)


def _events(spark):
    rows = [
        (f"2024-01-01 0{h}:{m:02d}:00", f"u{u}", 1.0)
        for h in range(3)
        for m in (5, 25, 45)
        for u in range(4)
    ]
    return spark.createDataFrame(
        rows, "ts_s string, user_id string, value double"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "value")


def _run_windowed_counts(spark, tmp_path, tag):
    src = str(tmp_path / f"src_{tag}")
    os.makedirs(src)
    _events(spark).write.parquet(src + "/b1.parquet")
    stream = spark.readStream.schema(
        "ts timestamp, user_id string, value double"
    ).parquet(src + "/*.parquet")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(f"rocks_{tag}")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(
        f"SELECT window.start AS ws, user_id, n, s FROM rocks_{tag}"
    ).collect()
    return sorted((str(r.ws), r.user_id, r.n, r.s) for r in out)


def test_rocksdb_provider_loads_and_runs(spark, tmp_path, rocksdb_conf):
    got = _run_windowed_counts(spark, tmp_path, "rdb")
    # 3 hours x 4 users, 3 events each
    assert len(got) == 12
    assert all(n == 3 and s == 3.0 for (_, _, n, s) in got)


def test_rocksdb_matches_default_provider(spark, tmp_path, rocksdb_conf):
    with_rocks = _run_windowed_counts(spark, tmp_path, "a")
    spark.conf.unset(PROVIDER_KEY)
    default = _run_windowed_counts(spark, tmp_path, "b")
    assert with_rocks == default


def test_rocksdb_state_survives_restart(spark, tmp_path, rocksdb_conf):
    """Second availableNow run over the same checkpoint must resume the
    RocksDB state (exactly-once over the already-processed file) and
    incorporate a newly arrived file."""
    src = str(tmp_path / "src_r")
    ckpt = str(tmp_path / "ckpt_r")
    os.makedirs(src)
    _events(spark).write.parquet(src + "/b1.parquet")

    def run():
        stream = spark.readStream.schema(
            "ts timestamp, user_id string, value double"
        ).parquet(src + "/*.parquet")
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocks_restart")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r.user_id: r.n
            for r in spark.sql("SELECT * FROM rocks_restart").collect()
        }

    first = run()
    assert first == {f"u{u}": 9 for u in range(4)}
    # a late-arriving second file; the restarted query must ADD it to
    # restored state, not recount b1
    _events(spark).select(
        "ts", F.concat(F.lit("x"), "user_id").alias("user_id"), "value"
    ).write.parquet(src + "/b2.parquet")
    second = run()
    assert second == {
        **{f"u{u}": 9 for u in range(4)},
        **{f"xu{u}": 9 for u in range(4)},
    }
