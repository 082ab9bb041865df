"""Frequency sketches as DataFrame compositions.

Count-Min sketch: a depth x width counter matrix where each of
``depth`` hash rows buckets every key into ``width`` counters;
the frequency estimate for a key is the MIN of its ``depth``
counters — never an underestimate, over by at most the collision
mass in its buckets.

Why this shape matters at 100 TB: the sketch build is one explode
(depth rows per input row — constant fan-out) + one map-side-combined
hash aggregate into depth*width counters, i.e. CONSTANT state no
matter how many distinct keys exist. Per-key exact counting shuffles
every distinct key; the sketch shuffles a fixed-size matrix. Queries
against the sketch are a broadcast join of the tiny counter table.

The bucket hash is md5-derived (first 8 hex chars -> int64 -> mod
width), so the whole structure — counters and estimates — is
bit-identical across engines and oracle-checkable EXACTLY, unlike
HLL/t-digest whose internals are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row: int, width: int) -> Column:
    """Deterministic bucket of ``key`` for hash row ``row``: portable
    md5 prefix as int64, mod width."""
    h = F.md5(F.concat(F.lit(f"{row}:"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width).cast(
        "int"
    )


def count_min_counters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """(row, bucket, cnt): the sketch matrix. One explode (fan-out
    ``depth``) + one hash aggregate with map-side combine into at most
    depth*width rows."""
    entries = df.select(
        F.posexplode(
            F.array(
                *[_bucket(F.col(key_col), r, width) for r in range(depth)]
            )
        ).alias("row", "bucket")
    )
    return entries.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimates(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Per-distinct-key CM estimate next to the exact count:
    (key, exact_n, cm_est). cm_est >= exact_n always (the CM
    guarantee); equality whenever none of the key's buckets collide.
    The counter matrix is broadcast — the probe side never shuffles
    for the join."""
    counters = count_min_counters(df, key_col, depth, width)
    keys = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    probes = keys.select(
        "key",
        "exact_n",
        F.posexplode(
            F.array(*[_bucket(F.col("key"), r, width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    est = (
        probes.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("key", "exact_n")
        .agg(F.min("cnt").alias("cm_est"))
    )
    return est.select(F.col("key").alias(key_col), "exact_n", "cm_est")
