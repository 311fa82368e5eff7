"""Registry-window invariants: the driver's correctness gate checks
only the FIRST 50 registered queries (verified round 1), so the
ordering is load-bearing — pin it."""

from __future__ import annotations

from adsmasterpipeline_spark.queries import (
    PRIORITY, REGISTRY, _load, all_oracles, all_queries,
)

_load()

MUST_PROVE = (
    # Round-12 rotation: the 35 oracled queries whose last
    # driver-green row is r09 (computed from committed
    # CORRECTNESS_r0{1..11}.json); after this round the cumulative
    # last-green floor advances to r10.
    "embedding_cosine_neardup_gemm", "embedding_quantize",
    "except_keys", "explode_tokens_top", "first_last_value",
    "full_outer_diff", "funnel_conversion", "gapfill_forward_fill",
    "has_fields", "histogram_prices", "hll_distinct_tokens",
    "incremental_dedup", "incremental_watermark_scan",
    "intersect_keys", "inverted_index_topdf", "join_anti",
    "mixture_temperature_weights", "pii_scrub", "q10_returned_items",
    "q11_important_stock", "q13_customer_distribution",
    "q15_top_supplier", "q16_supplier_cnt", "q18_large_volume",
    "q20_potential_promotion", "q21_suppliers_kept_waiting",
    "q22_global_sales_opportunity", "quality_rules_filter",
    "range_join_bands", "repetition_quality", "salted_group_counts",
    "source_mixture_sample", "span_dedup_docs",
    "streaming_windowed_counts", "zorder_data_skipping",
)


def test_priority_fills_window_exactly():
    assert len(PRIORITY) == 50
    assert len(set(PRIORITY)) == 50, "duplicate PRIORITY entries"


def test_priority_names_exist_and_are_oracled():
    for name in PRIORITY:
        assert name in REGISTRY, f"unknown PRIORITY entry {name}"
        assert REGISTRY[name].oracle is not None, \
            f"{name} is rows-only but pinned into the checked window"


def test_must_prove_queries_in_window():
    window = list(all_queries())[:50]
    missing = [n for n in MUST_PROVE if n not in window]
    assert not missing, f"must-prove queries outside the window: {missing}"


def test_rows_only_never_in_window():
    qs = list(all_queries())
    oracled = set(all_oracles())
    in_window_rows_only = [n for n in qs[:50] if n not in oracled]
    assert not in_window_rows_only


def test_oracle_order_matches_query_order():
    qs = [n for n in all_queries() if REGISTRY[n].oracle is not None]
    assert qs == list(all_oracles())
