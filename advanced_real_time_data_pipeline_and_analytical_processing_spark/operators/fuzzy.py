"""Fuzzy (edit-distance) similarity join with lossless blocking.

The naive fuzzy self-join is an all-pairs cross product — unusable at
scale. The standard fix is blocking, but ad-hoc block keys (first
letter, token overlap) silently LOSE pairs: one edit can change any
chosen key. This operator blocks on STRING LENGTH with a (2d+1)-way
fan-out on one side, which is provably complete for Levenshtein
distance <= d: every edit changes length by at most 1, so
|len(a) - len(b)| <= d for any matching pair, and emitting the right
side into blocks [len-d, len+d] guarantees every qualifying pair meets
in exactly the block keyed by the left side's length.

Cost shape at 100 TB: constant (2d+1) fan-out map + one shuffle on the
length key + per-block equi-joined candidate verify (levenshtein runs
JVM-side, codegen'd, only on candidates). Length blocks can be large;
``extra_block`` tightens them with any additional EXACT-match key the
domain guarantees (e.g. country code) without breaking completeness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 2,
    extra_block: Column | None = None,
) -> DataFrame:
    """(val_a, val_b, dist): all UNORDERED pairs of distinct values of
    ``col`` with levenshtein(val_a, val_b) <= max_dist, val_a < val_b.
    Lossless by the length-band argument above — the oracle checks this
    against a brute-force cross join."""
    vals = df.select(F.col(col).alias("val")).filter(F.col("val").isNotNull()).distinct()
    if extra_block is not None:
        vals = vals.withColumn("_xb", extra_block)
    left = vals.select(
        F.col("val").alias("val_a"),
        F.length("val").alias("_blk"),
        *([F.col("_xb").alias("_xba")] if extra_block is not None else []),
    )
    right = vals.select(
        F.col("val").alias("val_b"),
        F.explode(
            F.sequence(
                F.length("val") - max_dist, F.length("val") + max_dist
            )
        ).alias("_blk"),
        *([F.col("_xb").alias("_xbb")] if extra_block is not None else []),
    )
    cond = [left["_blk"] == right["_blk"]]
    if extra_block is not None:
        cond.append(F.col("_xba") == F.col("_xbb"))
    return (
        left.join(right, cond[0] if len(cond) == 1 else cond[0] & cond[1])
        .filter(F.col("val_a") < F.col("val_b"))
        .withColumn("dist", F.levenshtein("val_a", "val_b"))
        .filter(F.col("dist") <= max_dist)
        .select("val_a", "val_b", "dist")
        .distinct()
    )
