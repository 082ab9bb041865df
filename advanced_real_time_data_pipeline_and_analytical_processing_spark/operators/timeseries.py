"""Time-series regularization: gap-filling a per-key series onto a
dense spine with forward-fill.

Reporting and feature pipelines need every (key, period) cell present
— a day with no orders must appear with the carried-forward value, not
vanish. The reference has no analogue; this is the standard Spark
shape for it:

1. per-key bounds (one aggregate),
2. dense spine = ``explode(sequence(lo, hi, interval))`` — generated
   executor-side from two scalars per key, never materialized on the
   driver,
3. left join observations onto the spine (co-partitioned on the key),
4. forward-fill = ``last(value, ignorenulls=True)`` over an
   unbounded-preceding window per key.

Scale: one shuffle for the join + one for the window, both on the
key; the spine adds rows proportional to key-count x period-count,
independent of the observation count. Skew only if one key's range
vastly exceeds the others' — bound ``freq`` accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    period_col: str,
    value_cols: list[str],
    step: str = "1 day",
) -> DataFrame:
    """Dense per-key series from ``df``'s sparse (key, period, values)
    rows: every step between each key's min and max period appears
    exactly once, missing values forward-filled from the latest
    earlier observation. Adds ``is_filled`` marking synthesized rows.

    ``period_col`` must be date/timestamp-typed and unique per key
    (pre-aggregate to the period grain first)."""
    bounds = df.groupBy(key_col).agg(
        F.min(period_col).alias("_lo"), F.max(period_col).alias("_hi")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"interval {step}"))
        ).alias(period_col),
    )
    joined = spine.join(df, [key_col, period_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(period_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        period_col,
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
        F.col(value_cols[0]).isNull().alias("is_filled"),
    )
