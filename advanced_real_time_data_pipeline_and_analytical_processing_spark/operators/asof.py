"""As-of (backward) join — an operator Spark lacks natively.

Implemented as the union+window composition (preference (a) from the
build rules: composition of existing DataFrame ops):

    tag left/right → unionByName → window per key ordered by (ts, tag)
    → last(right payload, ignoreNulls) over unbounded-preceding frame
    → keep left rows.

This is the scale-correct shape: ONE shuffle + sort per key (same cost
as a sort-merge join), no range cross-product, no per-group pandas. Ties
(equal ts) resolve right-before-left, i.e. a right row AT the left ts
matches (<= semantics, like pandas merge_asof / DuckDB ASOF JOIN).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """For each left row, attach `value_cols` from the latest right row
    with right_ts <= left_ts, matching on `on` keys. Left columns are
    preserved; unmatched left rows get nulls."""
    from pyspark.sql.types import StructField, StructType

    on = list(on)
    lcols = left.columns
    # The right payload travels as ONE struct so last(..., ignorenulls)
    # keys on *row presence*: a matched right row whose value column is
    # NULL still wins (its struct is non-null) and the NULL propagates —
    # pandas merge_asof / DuckDB ASOF JOIN semantics. Per-column
    # last(ignorenulls) would instead skip back to an older right row.
    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in value_cols]
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts after right at equal ts
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on and c != left_ts],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r"),
    )
    unioned = l.unionByName(r)
    # `_r` as the final sort key: when several RIGHT rows share
    # (key, ts), last() would otherwise pick a partition-order-dependent
    # row — the struct itself makes the winner deterministic (the max
    # payload at the tied timestamp). Left rows carry a NULL struct and
    # sort first within their side, which changes nothing (_side
    # dominates).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f")
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *on,
            F.col("_ts").alias(left_ts),
            *[c for c in lcols if c not in on and c != left_ts],
            *[F.col("_f").getField(c).alias(c) for c in value_cols],
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Forward as-of: attach `value_cols` from the EARLIEST right row
    with right_ts >= left_ts — "next quote after the order", the
    mirror of asof_join. Same union+window shape and cost (one shuffle
    + sort per key), with the frame flipped to currentRow..unbounded
    FOLLOWING and first() instead of last(). Left tags _side=0 so at
    equal ts it sorts BEFORE the right row, which therefore sits
    inside the left row's frame — ties match (>= semantics), the
    mirror of the backward join's right-before-left ordering."""
    from pyspark.sql.types import StructField, StructType

    on = list(on)
    lcols = left.columns
    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in value_cols]
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # left sorts BEFORE right at equal ts
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in on and c != left_ts
        ],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r"),
    )
    unioned = l.unionByName(r)
    # Deterministic right-side tiebreaker, mirroring the backward join:
    # first() at a tied (key, ts) picks the MIN payload struct instead
    # of a partition-order-dependent row.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_r").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        "*", F.first("_r", ignorenulls=True).over(w).alias("_f")
    )
    return filled.filter(F.col("_side") == 0).select(
        *on,
        F.col("_ts").alias(left_ts),
        *[c for c in lcols if c not in on and c != left_ts],
        *[F.col("_f").getField(c).alias(c) for c in value_cols],
    )
