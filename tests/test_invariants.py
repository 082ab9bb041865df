"""Conservation/invariant pins for the allocation-style queries —
properties the oracle's value-hash implies only indirectly, asserted
here as first-class facts on the sf0.001 fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_linear_attribution_conserves_credit(spark):
    """Total distributed credit must equal exactly 1000 millis per
    purchase — the property the remainder policy exists to protect."""
    out = entrymod.queries()["linear_attribution_credit"](spark, SF)
    total = out.agg(F.sum("total_credit_millis")).collect()[0][0]
    events = spark.read.parquet(f"{SF}/events.parquet")
    n = events.filter(F.col("event_type") == "purchase").count()
    assert total == 1000 * n


def test_apportionment_sums_to_exactly_1000(spark):
    out = entrymod.queries()["budget_apportionment"](spark, SF)
    assert out.agg(F.sum("units")).collect()[0][0] == 1000


def test_gains_table_reaches_full_capture(spark):
    out = entrymod.queries()["decile_gains_table"](spark, SF).collect()
    last = max(out, key=lambda r: r.decile)
    assert last.capture_ppm == 1_000_000
    assert sum(r.n_converted for r in out) == last.cum_converted


def test_waterfall_reconciles(spark):
    rows = entrymod.queries()["revenue_waterfall"](spark, SF).collect()
    for r in rows:
        assert r.net_cents == r.gross_cents - r.discount_cents + r.tax_cents


def test_busy_time_equals_python_interval_union(spark):
    """The sweep-line burst merge must equal a reference interval
    union: total covered seconds per user, computed by plain Python
    merging, for the fixture corpus."""
    out = {
        r.user_id: (r.n_bursts, r.busy_seconds)
        for r in entrymod.queries()["user_busy_time"](spark, SF).collect()
    }
    from advanced_real_time_data_pipeline_and_analytical_processing_spark.catalog import load_table

    ev = load_table(spark, SF, "events").select(
        "user_id", F.unix_micros("ts").alias("t")
    ).collect()
    ivs = {}
    for r in ev:
        ivs.setdefault(r.user_id, []).append(
            (r.t - 150_000_000, r.t + 150_000_000)
        )
    want = {}
    for u, spans in ivs.items():
        spans.sort()
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        want[u] = (
            len(merged),
            sum(e - s for s, e in merged) // 1_000_000,
        )
    assert out == want
