"""Top-k per group (window rank) — the engine's standard top-k shape.

Window.partitionBy(group).orderBy(metric desc) + row_number <= k: the
sort is per-group within shuffle partitions, never a global sort. For
global top-k over a huge input prefer orderBy().limit(k) — Spark plans
that as TakeOrderedAndProject (per-partition heap + driver merge), which
is already optimal.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
