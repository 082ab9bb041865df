"""Driver supervision loop (reference T5/R2, ``code/Main.py:175-186``).

The reference restarts a dead streaming query every 10 s, forever
(``while True`` + sleep). This version keeps the semantics — restart
from checkpoint after a failure — but bounds the restart count and
backs off exponentially, so a permanently-broken query surfaces as an
exception instead of a silent hot loop.

Recovery correctness comes from the checkpoint, not from this loop: the
file source replays the failed micro-batch, and the ingest sinks are
idempotent per batch (dynamic-partition-overwrite on batch_id — see
streaming/ingest.py), so a restart neither loses nor duplicates rows.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql.streaming import StreamingQuery


def run_supervised(
    start_query: Callable[[], StreamingQuery],
    max_restarts: int = 5,
    backoff_s: float = 1.0,
    backoff_mult: float = 2.0,
) -> StreamingQuery:
    """Run `start_query` (which must start and return a StreamingQuery,
    e.g. ``lambda: start_ingest(spark, cfg)``) until it terminates
    cleanly; on failure, restart it from its checkpoint up to
    `max_restarts` times with exponential backoff.

    Returns the final (cleanly terminated) query. Re-raises the last
    failure once the restart budget is exhausted."""
    restarts = 0
    wait = backoff_s
    while True:
        query = start_query()
        try:
            query.awaitTermination()
            return query  # clean stop (availableNow drain or stop())
        except Exception:
            if restarts >= max_restarts:
                raise
            restarts += 1
            time.sleep(wait)
            wait *= backoff_mult
