"""Source-layer robustness: corrupt-line capture (PERMISSIVE +
declared corrupt column) and schema-evolution reads (mergeSchema)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from advanced_real_time_data_pipeline_and_analytical_processing_spark.sources import readers


def test_read_json_permissive_splits_good_and_corrupt(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "v": 2.5}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": 3.5}\n'
        '{"id": 3, "v": '  # truncated line
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    good, bad = readers.read_json_permissive(spark, str(p), schema)
    assert {r.id for r in good.collect()} == {1, 2}
    bad_lines = [r[0] for r in bad.collect()]
    assert len(bad_lines) == 2
    assert "THIS IS NOT JSON" in bad_lines[0] or "THIS IS NOT JSON" in bad_lines[1]
    # good leg carries the DECLARED schema only
    assert good.columns == ["id", "v"]


def test_read_parquet_evolving_unions_added_columns(spark, tmp_path):
    d = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(d)

    merged = readers.read_parquet_evolving(spark, d)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    # old file's rows surface the evolved column as NULL
    assert rows[1] is None and rows[2] == 9.5
