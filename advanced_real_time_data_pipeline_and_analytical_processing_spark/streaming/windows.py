"""Event-time windowed aggregations (the streaming semantics the
reference lacks — SURVEY.md §2.9 'absent streaming semantics').

Each builder works on both a batch and a streaming DataFrame (Spark's
unified API); in streaming mode add ``withWatermark`` so state is
bounded and late data has a defined discard point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    group_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window count/sum per group. Streaming state per
    (window × group) only — bounded by the watermark."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.window(ts_col, width).alias("w"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "15 minutes",
    group_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    src = df.withWatermark(ts_col, watermark) if watermark else df
    # avg in EXACT integer arithmetic end to end: float sums drift
    # with partition order, and even exact ratios can land on
    # 6th-decimal halves that engines round differently (half-up vs
    # half-even) — so sum integer ten-thousandths and FLOOR-divide to
    # micro-units; no floating sum, no round() anywhere
    scaled = F.round(F.col(value_col) * 10000).cast("bigint")
    return (
        src.groupBy(F.window(ts_col, width, slide).alias("w"), group_col)
        .agg(
            F.sum(scaled).alias("_ssum"),
            F.count(value_col).alias("_n"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            group_col,
            (
                F.expr("_ssum * 100 div _n").cast("double") / 1000000.0
            ).alias("avg_value"),
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows keyed by user with an inactivity gap."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("s"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
