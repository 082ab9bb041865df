from __future__ import annotations

import math

from pyspark.sql import functions as F

from advanced_real_time_data_pipeline_and_analytical_processing_spark.operators import similarity


def vec_df(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_dot_and_norm(spark):
    df = spark.createDataFrame([([1.0, 2.0], [3.0, 4.0])], "a array<double>, b array<double>")
    r = df.select(
        similarity.dot(F.col("a"), F.col("b")).alias("d"),
        similarity.l2_norm(F.col("a")).alias("n"),
    ).collect()[0]
    assert r["d"] == 11.0
    assert math.isclose(r["n"], math.sqrt(5.0))


def test_cosine_topk_ranking(spark):
    emb = vec_df(spark)
    out = similarity.cosine_topk(
        emb.filter(F.col("vec_id") == 0), emb, "vec_id", "vec_id", k=3
    ).collect()
    ranked = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0][0] == 1  # most similar
    assert ranked[-1][0] == 3  # least similar (opposite)
    assert all(r["query_id"] == 0 for r in out)
    assert len(out) == 3  # self excluded


def test_lsh_identical_vectors_same_bucket(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0])], "vec_id bigint, embedding array<double>"
    )
    planes = [[0.3, -0.5, 0.8], [-0.2, 0.9, 0.1], [0.7, 0.7, -0.7]]
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in similarity.hyperplane_lsh_buckets(df, "vec_id", "embedding", planes).collect()
    }
    assert buckets[0] == buckets[1]


def test_lsh_topk_finds_identical(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]), (2, [-1.0, -2.0, -3.0])],
        "vec_id bigint, embedding array<double>",
    )
    planes = [[0.3, -0.5, 0.8], [-0.2, 0.9, 0.1]]
    out = similarity.lsh_cosine_topk(
        df.filter(F.col("vec_id") == 0), df, "vec_id", "vec_id", planes, k=5
    ).collect()
    neighbors = {r["neighbor_id"]: r["score"] for r in out}
    assert neighbors.get(1) == 1.0  # identical vector found in same bucket
