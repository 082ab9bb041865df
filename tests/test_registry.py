"""Registry-contract pins — no Spark session needed.

The driver's hard correctness gate evaluates the FIRST 50 entries of
__spark_entry__.queries() in declaration order; docs/QUERIES.md
documents that head as deliberately frozen (best-verified queries
stay in the gated window; new work appends at the tail). These tests
make an accidental reorder/insertion a test failure instead of a
silent gate change, and keep queries()/oracle_sql() key parity."""

from __future__ import annotations

import __spark_entry__ as entrymod

FROZEN_HEAD_50 = [
    "flagship_event_stats", "validation_split", "row_hash_documents",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "top3_orders_per_customer", "segment_order_coverage",
    "rollup_returns", "priority_with_returns", "token_stats_by_lang",
    "doc_quality", "lang_pred_counts", "fingerprint_docs",
    "exact_dedup_docs", "cosine_topk", "events_hourly",
    "minhash_near_dup", "window_order_analytics",
    "rolling_7day_revenue", "sessionization", "asof_purchase_click",
    "distinct_agg_orders", "pivot_event_type_by_day",
    "unpivot_lineitem_metrics", "setops_nations",
    "median_price_by_brand", "range_join_price_bands", "top_bigrams",
    "stopword_profile", "vector_norms_by_label", "simhash_docs",
    "ngram_jaccard_pairs", "embedding_near_dup", "lsh_ann_topk",
    "ivf_ann_topk", "cube_order_stats", "grouping_sets_orders",
    "rolling_fingerprint", "quartiles_by_segment",
    "monthly_order_seasonality", "json_props_stats",
    "q17_small_qty_revenue", "q4_late_orders", "q6_revenue_forecast",
    "q7_volume_shipping", "q10_returned_items", "q14_promo_revenue",
    "q15_top_supplier", "q18_large_orders",
]


def test_gated_head_order_is_frozen():
    assert list(entrymod.queries().keys())[:50] == FROZEN_HEAD_50


def test_every_query_has_an_oracle_and_vice_versa():
    q = set(entrymod.queries().keys())
    o = set(entrymod.oracle_sql().keys())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_every_query_is_callable_and_documented():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name
        assert fn.__doc__ and len(fn.__doc__) > 40, (
            f"{name} lacks a meaningful docstring"
        )


def test_no_oracle_carries_the_rexs_whitespace_shorthand():
    """Java regex \\s matches vertical tab; RE2's does not (r8,
    tests/test_java_ws.py). _java_ws expands the shorthand at
    the oracle_sql() exit — this pin fails if a future oracle path
    bypasses it and reintroduces engine-interpreted \\s."""
    for name, sql in entrymod.oracle_sql().items():
        assert r"\s" not in sql, (
            f"{name}: RE2 \\s shorthand reached DuckDB — route the "
            "oracle through _java_ws or spell the Java class out"
        )


NULLABLE_ORDER_KEY_PINS = {
    # oracle name -> required explicit-NULLS fragment in its top-level
    # ORDER BY. Spark ASC defaults to NULLS FIRST while DuckDB defaults
    # to NULLS LAST in both directions, so every nullable sort key in a
    # declared-ORDER-BY oracle must pin placement explicitly (r12's one
    # hostile-fixture C3 `tie`: stratified_split's NULL-lang group).
    # Nullability evidence: testdata_hostile_nonan NULL census (r13).
    "q4_late_orders": "o_orderpriority NULLS FIRST",
    "q18_large_orders": "totalprice_cents DESC NULLS LAST",
    "q22_idle_rich_customers": "c_mktsegment NULLS FIRST",
    "centroid_cohesion": "label NULLS FIRST",
    "q2_min_unit_price_supplier": "acctbal DESC NULLS LAST",
    "hash_sample_by_lang": "lang NULLS FIRST",
    "stratified_split": "ORDER BY 1 NULLS FIRST, 2 NULLS FIRST",
    "skew_profile_events": "key ASC NULLS FIRST",
}


def test_nullable_order_keys_pin_null_placement():
    """Every declared-ORDER-BY oracle whose sort key can be NULL (per
    the hostile-fixture NULL census) spells NULLS FIRST/LAST out, so
    the C3 ordered compare (tools/indep_check.py --strict-order) stays
    exact on NULL-bearing fixtures instead of tying on the engines'
    opposite placement defaults."""
    oracles = entrymod.oracle_sql()
    for name, fragment in NULLABLE_ORDER_KEY_PINS.items():
        assert fragment in oracles[name], (
            f"{name}: nullable sort key lost its explicit NULLS "
            f"placement (expected '{fragment}' in the oracle ORDER BY)"
        )
