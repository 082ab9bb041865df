"""Bloom-filter pre-join pruning.

The fourth tool in the engine's join kit (broadcast for small sides,
salting for hot keys, bucketing for repeated joins): when the build
side is too large to broadcast as DATA but its key set still fits as
BITS, a Bloom filter prunes the probe side before the real join —
the shuffle then carries only rows that might match, instead of the
whole fact table. Spark's AQE can inject runtime row-group filters;
this operator is the explicit, plannable version with a measurable
false-positive budget.

Mechanics (pure DataFrame ops, no UDF, no driver bitset):
- the filter is a DataFrame of SET BIT POSITIONS: k md5-derived
  positions per build key, distinct — at most m rows, broadcast;
- a probe row survives iff ALL k of its positions are present
  (count == k after an inner join on position);
- survivors then take the real join. No false negatives ever (the
  pre-filter only drops rows whose membership is impossible); false
  positives only cost wasted work in the real join, bounded by
  (1 - e^(-kn/m))^k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, k: int, m_bits: int) -> Column:
    """array<int> of ``k`` md5-derived bit positions in [0, m_bits)."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % m_bits
            ).cast("int")
            for i in range(k)
        ]
    )


def bloom_bits(
    build: DataFrame, key_col: str, k: int = 3, m_bits: int = 1 << 16
) -> DataFrame:
    """The filter itself: one column ``bit`` of distinct set positions
    (<= m_bits rows, typically far fewer). One explode + distinct."""
    return (
        build.select(
            F.explode(_positions(F.col(key_col), k, m_bits)).alias("bit")
        )
        .distinct()
    )


def bloom_prefilter(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    k: int = 3,
    m_bits: int = 1 << 16,
) -> DataFrame:
    """Rows of ``probe`` whose key MIGHT be in ``build`` (no false
    negatives). The bit table is broadcast; the probe side is filtered
    in place — its shuffle (if any) happens after pruning."""
    bits = bloom_bits(build, build_key, k, m_bits)
    # per-ROW id, not per-key grouping: duplicate probe rows must each
    # survive independently (grouping identical rows would pool their
    # hit counts and false-negative them out)
    tagged = probe.withColumn("_bloom_rid", F.monotonically_increasing_id())
    probed = tagged.withColumn(
        "_bloom_pos", F.explode(_positions(F.col(probe_key), k, m_bits))
    )
    hits = (
        probed.join(F.broadcast(bits), probed["_bloom_pos"] == bits["bit"])
        .drop("bit", "_bloom_pos")
        .groupBy("_bloom_rid", *probe.columns)
        .agg(F.count(F.lit(1)).alias("_nhits"))
    )
    return hits.filter(F.col("_nhits") == k).drop("_nhits", "_bloom_rid")
