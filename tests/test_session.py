"""Both session factory paths must pin the gate's semantics.

VERDICT r6 #2: `get_spark` historically left `spark.sql.ansi.enabled`
at the Spark 4 default (ON), so local pytest sessions ran under
DIFFERENT overflow/cast semantics than the driver gate (which routes
through `configure_session`, ANSI off). One divergent conf is exactly
how a silent-int64-wrap bug class stays invisible locally: ANSI-on
throws where the gate wraps. Assert both factories agree.
"""

from __future__ import annotations

from advanced_real_time_data_pipeline_and_analytical_processing_spark.session import configure_session


def test_get_spark_pins_ansi_off(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"


def test_configure_session_pins_ansi_off(spark):
    # flip it the way a hostile driver session might, then re-pin
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        configure_session(spark)
        assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_factories_agree_on_gate_confs(spark):
    configure_session(spark)
    for conf, want in [
        ("spark.sql.ansi.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ]:
        assert spark.conf.get(conf) == want, conf
