"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful event-time logic at all (SURVEY.md §2.9:
processing-time micro-batches only, unbounded dropDuplicates state its
lone stateful op). This module supplies the arbitrary-state surface a
real pipeline needs: per-key running aggregates maintained across
micro-batches with explicit state schemas.

Scale notes: state lives in the state store partitioned by grouping
key — the shuffle is on the key, state size is O(distinct keys), and
each micro-batch touches only keys present in the batch. Arrow batches
(applyInPandas*) keep the per-key Python work vectorized.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_stats(stream_df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (count, sum(value)) maintained in the state store.

    Output mode 'update': one row per key per micro-batch the key
    appears in, carrying the cumulative totals so far — the streaming
    generalization of the reference's per-batch aggregate table
    (code/helpers.py:148-204), which recomputed from scratch per batch.
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "sum_value": [total]}
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} bigint, n_events bigint, sum_value double",
        stateStructType="n_events bigint, sum_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_to_memory_table(
    spark: SparkSession,
    streamed: DataFrame,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run a (bounded) streaming DataFrame to completion with an
    availableNow trigger into an in-memory sink; return the final batch
    result. Backfill mode: the same plan runs continuously under a
    processingTime trigger in production."""
    name = f"drain_{uuid.uuid4().hex[:12]}"
    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"ckpt_{name}"
    )
    q = (
        streamed.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
