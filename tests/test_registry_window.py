"""Registry-window invariants: the driver's correctness gate checks
only the FIRST 50 registered queries (verified round 1), so the
ordering is load-bearing — pin it."""

from __future__ import annotations

from adsmasterpipeline_spark.queries import (
    PRIORITY, REGISTRY, _load, all_oracles, all_queries,
)

_load()

MUST_PROVE = (
    # VERDICT r7 task 2 + #4: the two RETUNED oracles this round
    # (ann_ivf_kmeans: two Lloyd updates + nprobe 3; ann_sign_lsh:
    # hamming-4 multiprobe) must re-prove first; then the 28 oracled
    # queries whose last driver-green row is r05 (computed from
    # committed CORRECTNESS_r0*.json; the r06 additions got their
    # driver rows in r07) so cumulative staleness drops to <= r06
    # for every oracled query.
    "ann_ivf_kmeans", "ann_sign_lsh",
    "ngram_jaccard_pairs", "pivot_status_by_segment",
    "posexplode_components", "q12_shipmode_priority",
    "q14_promo_revenue", "q19_disjunctive", "q1_pricing_summary",
    "q3_shipping_priority", "q4_order_priority",
    "q5_regional_revenue", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "quantiles_per_segment", "semantic_dedup", "sequence_pack",
    "sessionize", "simhash", "stats_per_brand", "stratified_sample",
    "text_quality", "tfidf_top_terms", "token_count",
    "union_all_counts", "union_distinct", "vector_norms",
    "winnow_fingerprints",
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
