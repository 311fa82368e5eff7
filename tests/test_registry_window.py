"""Registry-window invariants: the driver's correctness gate checks
only the FIRST 50 registered queries (verified round 1), so the
ordering is load-bearing — pin it."""

from __future__ import annotations

from adsmasterpipeline_spark.queries import (
    PRIORITY, REGISTRY, _load, all_oracles, all_queries,
)

_load()

MUST_PROVE = (
    # VERDICT r9 task 1: pure staleness rotation — the 28 oracled
    # queries whose last driver-green row is r07 (computed from
    # committed CORRECTNESS_r0{1..9}.json) lead; after this round the
    # cumulative last-green floor advances to r08.
    "join_left_outer", "join_semi", "json_payload_extract",
    "label_centroid_distance", "langid_heuristic",
    "levenshtein_similarity", "merge_last_writer_wins",
    "min_cost_supplier", "minhash_signatures", "native_max_by",
    "ntile_rank_scalable", "pagerank_supplier_customer",
    "path_transitions", "regexp_rewrite", "rollup_revenue",
    "shingle_containment_pairs", "sliding_window_counts",
    "string_agg_ordered", "string_hier_facet", "topk_per_group",
    "triangle_copurchase", "vocab_encode_docs", "window_bucket_assign",
    "window_flag_first", "window_lag_lead", "window_ntile_rank",
    "window_range_frame", "window_running_total",
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
