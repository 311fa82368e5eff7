"""Registry-window invariants: the driver's correctness gate checks
only the FIRST 50 registered queries (verified round 1), so the
ordering is load-bearing — pin it."""

from __future__ import annotations

from adsmasterpipeline_spark.queries import (
    PRIORITY, REGISTRY, _load, all_oracles, all_queries,
)

_load()

MUST_PROVE = (
    # VERDICT r10 task 1: the 4 round-10 txn queries that have never
    # had a driver row lead, then the 28 oracled queries whose last
    # driver-green row is r08 (computed from committed
    # CORRECTNESS_r0{1..10}.json); after this round every oracled
    # query has a driver row and the last-green floor advances to r09.
    "txn_constraint_gate", "txn_dv_delete_feed",
    "txn_dv_restore_state", "txn_restore_diff",
    "ngram_jaccard_pairs", "pivot_status_by_segment",
    "posexplode_components", "q12_shipmode_priority",
    "q14_promo_revenue", "q19_disjunctive", "q1_pricing_summary",
    "q3_shipping_priority", "q4_order_priority", "q5_regional_revenue",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "quantiles_per_segment", "semantic_dedup",
    "sequence_pack", "sessionize", "simhash", "stats_per_brand",
    "stratified_sample", "text_quality", "tfidf_top_terms",
    "token_count", "union_all_counts", "union_distinct",
    "vector_norms", "winnow_fingerprints",
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
