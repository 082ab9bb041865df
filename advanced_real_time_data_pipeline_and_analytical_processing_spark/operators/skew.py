"""Explicit skew-mitigation joins.

The session enables AQE skew-join splitting (session.py), which
handles garden-variety skew by splitting oversized partitions at
runtime. The remaining case is EXTREME single-key skew — one key
holding a double-digit share of a 100 TB fact table — where even a
split partition is hot because every split still joins the same
build-side rows. The standard fix is salting:

- fan the build (smaller, non-broadcastable) side out ``num_salts``
  ways with an exploded salt column;
- give each probe-side row a deterministic salt in [0, num_salts);
- join on (key, salt): the hot key's rows now spread across
  ``num_salts`` reducers.

Cost model: build side is replicated ``num_salts`` times through the
shuffle — choose the smallest fan-out that flattens the hot key
(measure with maintenance.skew_profile, don't guess). If the build
side fits in memory, prefer plain ``F.broadcast`` — salting is for
the middle regime (too big to broadcast, too skewed to shuffle flat).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_equi_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    num_salts: int = 8,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe`` (large, skewed) with ``build`` on the
    ``on`` column names, salted ``num_salts`` ways.

    ``salt_source``: expression whose hash spreads probe rows (default:
    a stable hash over ALL probe columns — deterministic for a given
    row, uniform enough to flatten any hot key). Results equal the
    unsalted join for any ``how`` whose semantics survive build-side
    replication (inner/left; NOT right/full/left_anti — the replicated
    build rows would fabricate or suppress unmatched-row output)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how!r}")
    src = (
        salt_source
        if salt_source is not None
        else F.hash(*[F.col(c) for c in probe.columns])
    )
    p = probe.withColumn(SALT_COL, F.pmod(F.hash(src), F.lit(num_salts)))
    b = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return p.join(b, [*on, SALT_COL], how).drop(SALT_COL)
