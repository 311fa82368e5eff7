"""Registry-window invariants: the driver's correctness gate checks
only the FIRST 50 registered queries (verified round 1), so the
ordering is load-bearing — pin it."""

from __future__ import annotations

from adsmasterpipeline_spark.queries import (
    PRIORITY, REGISTRY, _load, all_oracles, all_queries,
)

_load()

MUST_PROVE = (
    # r02-red (events-loader casualties, fixed round 3) — need green rows
    "merge_last_writer_wins", "checksum_dispatch",
    "incremental_watermark_scan", "sessionize",
    "asof_attribution", "streaming_windowed_counts",
    # never driver-checked before round 3 — corpus hygiene / layout / misc
    "pii_scrub", "quality_rules_filter", "span_dedup_docs",
    "source_mixture_sample", "zorder_data_skipping",
    "cluster_keeper_quality", "salted_group_counts", "tfidf_top_terms",
    # never driver-checked tpch_full shapes
    "q3_shipping_priority", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q18_large_volume", "q21_suppliers_kept_waiting",
    # the ten round-3 queries (never driver-checked)
    "semantic_dedup", "dsir_importance_weights",
    "mixture_temperature_weights", "embedding_cosine_neardup_gemm",
    "vocab_encode_docs", "bigram_lm_nll", "bm25_topdf_terms",
    "chunk_documents", "char_entropy", "winnow_fingerprints",
    # one representative per previously-green family (regression canaries)
    "dedup_exact", "minhash_signatures", "ngram_jaccard_pairs",
    "dedup_clusters", "cosine_topk", "text_quality",
    "repetition_quality", "benchmark_contamination",
    "assign_scalable", "range_join_bands", "q1_pricing_summary",
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
