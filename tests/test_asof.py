from __future__ import annotations

from advanced_real_time_data_pipeline_and_analytical_processing_spark.operators.asof import asof_join


def test_asof_backward_join(spark):
    left = spark.createDataFrame(
        [("k1", 10, "L10"), ("k1", 20, "L20"), ("k1", 5, "L5"), ("k2", 10, "Lk2")],
        "k string, ts int, lpay string",
    )
    right = spark.createDataFrame(
        [("k1", 8, 0.8), ("k1", 10, 1.0), ("k1", 15, 1.5), ("k3", 1, 9.9)],
        "k string, ts int, rval double",
    )
    out = {
        (r["k"], r["ts"]): r["rval"]
        for r in asof_join(left, right, ["k"], "ts", "ts", ["rval"]).collect()
    }
    assert out[("k1", 5)] is None       # nothing at or before 5
    assert out[("k1", 10)] == 1.0       # exact-time match (<= semantics)
    assert out[("k1", 20)] == 1.5       # latest before 20
    assert out[("k2", 10)] is None      # key with no right rows survives
    assert len(out) == 4                # all left rows preserved


def test_asof_preserves_left_columns(spark):
    left = spark.createDataFrame([("k1", 10, "payload")], "k string, ts int, lpay string")
    right = spark.createDataFrame([("k1", 9, 1.0)], "k string, ts int, rval double")
    row = asof_join(left, right, ["k"], "ts", "ts", ["rval"]).collect()[0]
    assert row["lpay"] == "payload"
    assert row["ts"] == 10
    assert row["rval"] == 1.0


def test_forward_asof_matches_next_and_ties(spark):
    """Forward as-of: earliest right at-or-after left ts; equal-ts
    rows MATCH (>= semantics); no later right -> NULL."""
    from advanced_real_time_data_pipeline_and_analytical_processing_spark.operators import asof

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (1, 100, "c"), (2, 5, "d")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 30, 2.0), (1, 90, 3.0)],
        "k long, ts long, v double",
    )
    out = {
        r.tag: r.v
        for r in asof.asof_join_forward(
            left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert out == {"a": 1.0, "b": 2.0, "c": None, "d": None}
