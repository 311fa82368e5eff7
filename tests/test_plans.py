"""Physical-plan assertions: pushdown, pruning, broadcast choice,
codegen coverage, and shuffle topology for the headline queries.
Catching a plan regression here is as important as value correctness —
at 100 TB the plan IS the product."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adsmasterpipeline_spark.plans.explain import (
    codegen_stage_count, has_broadcast_join, join_strategies,
    pushed_filters, read_schemas, scan_count, single_partition_exchanges,
    takeordered_count,
)
from adsmasterpipeline_spark.queries import REGISTRY, _load
from tests.conftest import SF_DIR

_load()


def _q(spark, name):
    return REGISTRY[name].spark_fn(spark, SF_DIR)


def test_q1_filter_pushdown_and_pruning(spark):
    df = _q(spark, "q1_pricing_summary")
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf), pf
    # only the 7 needed columns reach the scan, not all 11
    rs = read_schemas(df)[0]
    assert "l_orderkey" not in rs and "l_partkey" not in rs
    for needed in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        assert needed in rs


def test_q1_whole_stage_codegen(spark):
    """The scan→filter→partial-agg pipeline must fuse into codegen
    stages (AQE hides the annotation, so inspect with AQE off)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = _q(spark, "q1_pricing_summary")
        assert codegen_stage_count(df) >= 2  # pre- and post-shuffle stages
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q5_broadcasts_dimensions(spark):
    df = _q(spark, "q5_regional_revenue")
    strategies = join_strategies(df)
    # region/nation/dim chain broadcast; no cartesian anywhere
    assert strategies.count("BroadcastHashJoin") >= 2, strategies
    assert "CartesianProduct" not in strategies
    # region filter pushed to its scan
    assert any("r_name" in f for f in pushed_filters(df))


def test_semi_anti_stay_joins(spark):
    for name in ("join_semi", "join_anti"):
        df = _q(spark, name)
        s = join_strategies(df)
        assert s, f"{name}: no join found"
        assert "CartesianProduct" not in s
        assert "BroadcastNestedLoopJoin" not in s


def test_incremental_scan_pushdown(spark):
    df = _q(spark, "incremental_watermark_scan")
    # events is read via the nanos-as-long path; the ts filter applies
    # post-conversion but projection pruning must still reach the scan
    rs = read_schemas(df)[0]
    assert "props" not in rs and "value" not in rs


def test_point_lookup_pushdown(spark):
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = lineitem.where(F.col("l_orderkey") == 42).select("l_quantity")
    assert any("l_orderkey" in f and "42" in f for f in pushed_filters(df))
    rs = read_schemas(df)[0]
    assert rs.count(",") == 1  # exactly two columns read


def test_cosine_topk_broadcasts_queries(spark):
    """All-pairs scoring against a tiny query set: the right plan is a
    broadcast (nested-loop, non-equi condition) with the QUERY side
    built — never a cartesian shuffle."""
    s = join_strategies(_q(spark, "cosine_topk"))
    assert "BroadcastNestedLoopJoin" in s or "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    # the bucketed ANN variant upgrades to an equi hash join
    s2 = join_strategies(_q(spark, "ann_sign_lsh"))
    assert "BroadcastHashJoin" in s2 or "SortMergeJoin" in s2


def test_bucket_assign_single_funnel_is_known(spark):
    """The declarative W3 window funnels once (documented trade-off);
    the scalable variant must NOT add one beyond the final offsets
    broadcast."""
    declarative = _q(spark, "window_bucket_assign")
    assert single_partition_exchanges(declarative) >= 1
    scalable = _q(spark, "assign_scalable")
    assert single_partition_exchanges(scalable) == 0


def test_merge_lww_is_one_shuffle(spark):
    df = _q(spark, "merge_last_writer_wins")
    # one hash exchange for the window, no extra repartition
    from adsmasterpipeline_spark.plans.explain import explain_str
    plan = explain_str(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_scan_counts_bounded(spark):
    # jaccard reads documents 4x (token self-join + two size joins);
    # the tiny table makes re-scan cheaper than a cache/exchange here
    assert scan_count(_q(spark, "ngram_jaccard_pairs")) <= 4
    assert scan_count(_q(spark, "q1_pricing_summary")) == 1


def test_prefix_jaccard_no_cartesian_no_forced_broadcast(spark):
    """The PPJoin candidate join must stay an equi hash/sort-merge join
    on the prefix token, and NO side may carry a forced broadcast
    hint: the token-DF dictionary is the corpus-wide distinct-token
    table (billions of rows at 100 TB — a hinted broadcast would OOM
    every executor). The optimizer choosing broadcast at tiny SF from
    its own size estimate is fine — the hint overriding it is not."""
    from adsmasterpipeline_spark.plans.explain import broadcast_hint_count

    df = _q(spark, "ngram_jaccard_pairs")
    s = join_strategies(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert broadcast_hint_count(df) == 0


def test_ivf_kmeans_broadcasts_centroids(spark):
    """Centroid assignment is a broadcast against the tiny centroid
    table — never a shuffled cartesian of the embedding scan."""
    df = _q(spark, "ann_ivf_kmeans")
    s = join_strategies(df)
    assert "CartesianProduct" not in s
    assert has_broadcast_join(df)


def test_corpus_pipeline_no_cartesian(spark):
    s = join_strategies(_q(spark, "corpus_dedup_pipeline"))
    assert "CartesianProduct" not in s


def test_semantic_dedup_bounded_pairs(spark):
    """Centroid table broadcasts (k rows); the only self-join keys on
    the cluster id — no corpus-wide cartesian pair space."""
    df = _q(spark, "semantic_dedup")
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in join_strategies(df)


def test_dsir_pruned_scan_no_cartesian(spark):
    """Importance weighting reads only (doc_id, lang, text); the scalar
    totals cross-join is a broadcast of one row, never a cartesian of
    data-sized sides."""
    df = _q(spark, "dsir_importance_weights")
    for rs in read_schemas(df):
        assert "source" not in rs and "n_chars" not in rs
    assert "CartesianProduct" not in join_strategies(df)


def test_vocab_encode_broadcast_and_bounded_sort(spark):
    """Vocab selection is DISTRIBUTED TopK (TakeOrderedAndProject —
    per-partition 256-row heaps), so there is NO single-partition
    exchange anywhere: the id window runs over the already-collapsed
    256-row TopK output. The encode join must broadcast the vocab, and
    the corpus text never shuffles (explode output shuffles as
    (doc_id, pos, tok) rows only)."""
    df = _q(spark, "vocab_encode_docs")
    assert has_broadcast_join(df)
    assert takeordered_count(df) >= 1
    assert single_partition_exchanges(df) == 0


def test_bm25_distributed_topk(spark):
    """Both the query-term top-3 and the final top-50 must compile to
    TakeOrderedAndProject; the only SinglePartition exchange allowed is
    the one-row corpus-stats aggregate (its input is one pre-aggregated
    row per partition) — never a global sort of the corpus-sized
    scored table."""
    df = _q(spark, "bm25_topdf_terms")
    assert has_broadcast_join(df)
    assert takeordered_count(df) >= 2
    assert single_partition_exchanges(df) <= 1


def test_contamination_broadcasts_benchmark(spark):
    """The benchmark shingle set (eval sets are small) must broadcast;
    the training side streams map-side — no doc x doc pair join."""
    df = _q(spark, "benchmark_contamination")
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in join_strategies(df)


def test_bigram_lm_no_cartesian_pruned_scan(spark):
    """LM scoring shuffles (doc, bigram) count rows and a
    bigram-vocabulary weight table — never a cartesian, never text
    columns beyond (doc_id, text) at the scan."""
    df = _q(spark, "bigram_lm_nll")
    assert "CartesianProduct" not in join_strategies(df)
    for rs in read_schemas(df):
        assert "source" not in rs and "lang" not in rs


def test_sequence_pack_parallel_windows(spark):
    """Per-shard packing must not funnel the corpus through one
    partition (the global-order variant would)."""
    assert single_partition_exchanges(_q(spark, "sequence_pack")) == 0


def test_stratified_sample_is_narrow(spark):
    """Sampling is a pure filter: one scan, no exchange at all."""
    from adsmasterpipeline_spark.plans.explain import explain_str
    df = _q(spark, "stratified_sample")
    assert scan_count(df) == 1
    assert "Exchange" not in explain_str(df, "simple")


def test_repetition_quality_prunes_scan(spark):
    """Only doc_id + text reach the parquet scan."""
    for rs in read_schemas(_q(spark, "repetition_quality")):
        assert "lang" not in rs and "source" not in rs


def test_ntile_scalable_no_data_sized_funnel(spark):
    """The scalable ntile/percent_rank twin must keep every
    single-partition exchange bounded (segment table + 1-row count):
    <= 2 such exchanges, none fed by the customer scan directly, and
    the declarative twin's output must match bit-for-bit."""
    df = _q(spark, "ntile_rank_scalable")
    assert single_partition_exchanges(df) <= 2
    assert "CartesianProduct" not in join_strategies(df)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in _q(spark, "window_ntile_rank").collect())
    assert a == b


def test_product_analytics_plans_are_scale_safe(spark):
    """Funnel/cohort/path: no cartesian joins, no data-sized
    single-partition exchanges (path's lag window partitions by user),
    and the events scan never reads the props payload column."""
    for name in ("funnel_conversion", "cohort_retention",
                 "path_transitions"):
        df = _q(spark, name)
        assert "CartesianProduct" not in join_strategies(df), name
        assert single_partition_exchanges(df) == 0, name
        for rs in read_schemas(df):
            assert "props" not in rs, name


def test_sketch_plans_prune_and_bound(spark):
    """CMS/HLL read only what they need from the documents scan; the
    Bloom membership join stays an equi join on bit ids (broadcast),
    never a nested-loop against an array."""
    for name, banned in (("countmin_heavy_hitters", ("lang", "source")),
                         ("hll_distinct_tokens", ("source", "n_chars"))):
        df = _q(spark, name)
        for rs in read_schemas(df):
            for col in banned:
                assert col not in rs, (name, col)
        assert "CartesianProduct" not in join_strategies(df)
    bloom = _q(spark, "bloom_shingle_filter")
    s = join_strategies(bloom)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_triangle_copurchase_all_equi_joins(spark):
    """Triangle counting must stay equi-join shaped end-to-end: pair
    generation is a basket groupBy on l_orderkey (no join at all) and
    the wedge/closure joins key on node ids — never a cartesian or
    nested-loop — and only the two needed lineitem columns reach the
    scan."""
    df = _q(spark, "triangle_copurchase")
    s = join_strategies(df)
    assert "CartesianProduct" not in s
    for rs in read_schemas(df):
        assert "l_extendedprice" not in rs
        assert "l_comment" not in rs


def test_gapfill_window_is_user_partitioned(spark):
    """Gap-fill's forward-fill window partitions by user_id, so the
    plan must carry ZERO single-partition exchanges (a global-sort
    ffill would be the classic scale bug) and the events scan must
    skip the props payload column."""
    df = _q(spark, "gapfill_forward_fill")
    assert single_partition_exchanges(df) == 0
    assert "CartesianProduct" not in join_strategies(df)
    for rs in read_schemas(df):
        assert "props" not in rs


def test_sliding_window_counts_scale_safe(spark):
    """Batch sliding-window agg: window assignment is a codegen-side
    expansion + one keyed aggregate — no single-partition exchange,
    and the events scan reads neither props nor value."""
    df = _q(spark, "sliding_window_counts")
    assert single_partition_exchanges(df) == 0
    for rs in read_schemas(df):
        assert "props" not in rs
        assert "value" not in rs
