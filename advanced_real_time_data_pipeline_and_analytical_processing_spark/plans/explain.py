"""Plan-inspection utilities: the programmatic view of a DataFrame's
physical plan that the engine's own tests and tools assert against.

`.explain()` prints for humans; these helpers return numbers so
shuffle discipline is checkable in CI: exchange count (every one is a
full shuffle of its input), broadcast count (small-side joins), and
whether filters reached the parquet scan (pushdown). A query whose
exchange count grows without a semantic reason has regressed — at
100 TB an extra exchange is the difference between minutes and hours.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

_EXCHANGE_KINDS = (
    "hashpartitioning",
    "rangepartitioning",
    "RoundRobinPartitioning",
    "SinglePartition",
)


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass(frozen=True)
class PlanProfile:
    exchanges: int
    broadcasts: int
    pushed_filter_scans: int
    plan: str

    def __str__(self) -> str:  # compact one-liner for logs
        return (
            f"exchanges={self.exchanges} broadcasts={self.broadcasts} "
            f"pushed_filter_scans={self.pushed_filter_scans}"
        )


def profile(df: DataFrame) -> PlanProfile:
    """Count shuffles/broadcasts/pushdown in ``df``'s physical plan.
    Counts are from the pre-execution adaptive plan — AQE may further
    coalesce partitions at runtime but never adds exchanges."""
    plan = physical_plan(df)
    return PlanProfile(
        exchanges=sum(plan.count(f"Exchange {k}") for k in _EXCHANGE_KINDS),
        broadcasts=plan.count("BroadcastExchange"),
        pushed_filter_scans=len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        plan=plan,
    )
