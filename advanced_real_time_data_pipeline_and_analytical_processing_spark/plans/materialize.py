"""Materialization barrier with a durability switch.

``materialize(df)`` is the engine's standard lineage cut: every
multi-consumer frame and every iterative-loop round goes through it
(dedup shingles, graph rounds, simhash/phash fingerprints, ...).

Local mode / single-job batch: ``localCheckpoint`` — executor-local
blocks, cheapest barrier, fine when losing an executor just fails the
job and the job is rerun.

Cluster mode with executor churn (the 1000-executor case in
docs/CLUSTER.md): set ``SPARK_GRAFT_DURABLE=1`` and every call site
switches to ``persist(StorageLevel.DISK_ONLY)`` — recomputable-on-loss
storage that survives executor death, at the cost of keeping lineage
(plans grow across iterative rounds, which is why it is a switch and
not the default). The env var is read per call, so a test can flip it
without rebuilding the session.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def durable_mode() -> bool:
    return os.environ.get("SPARK_GRAFT_DURABLE", "") not in ("", "0", "false")


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut lineage (localCheckpoint) or durably cache (persist DISK_ONLY
    under SPARK_GRAFT_DURABLE=1). ``eager=True`` forces computation now
    in both modes (persist is lazy, so durable-eager runs a count())."""
    if durable_mode():
        out = df.persist(StorageLevel.DISK_ONLY)
        if eager:
            out.count()
        return out
    return df.localCheckpoint(eager=eager)
