"""Registry-window invariants: the driver's correctness gate checks
only the FIRST 50 registered queries (verified round 1), so the
ordering is load-bearing — pin it."""

from __future__ import annotations

from adsmasterpipeline_spark.queries import (
    PRIORITY, REGISTRY, _load, all_oracles, all_queries,
)

_load()

MUST_PROVE = (
    # VERDICT r6 task 2: the round-6 additions were judge-run green
    # but have never had a DRIVER row — they must hold the window
    # front until CORRECTNESS_r07 records them (the round-6
    # must-prove set all went green in CORRECTNESS_r06; the rest of
    # the window refreshes the stalest r04/r05 evidence)
    "shingle_containment_pairs", "distinct_ngram_diversity",
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
