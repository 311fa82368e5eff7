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
# Round-3 rotation (VERDICT.md r2 task 4): the cumulative driver-green
# set across rounds is what counts, so this window = the six r02-red
# queries (loader fix needs green rows) + every oracled query without a
# driver row as of the rotation (21: four hygiene, zorder,
# salted/tfidf, cluster keeper, thirteen tpch_full shapes) + the ten
# NEW round-3 queries (registered after the rotation, slotted in by
# ceding multiply-proven family representatives) + one representative
# per remaining previously-green family.  Everything else is covered by
# the committed full-registry artifacts CHECKALL_r03_sf001/sf01.json.
PRIORITY: tuple[str, ...] = (
    # -- r02-red, fixed by the dtype-adaptive events loader --
    "merge_last_writer_wins", "checksum_dispatch",
    "incremental_watermark_scan", "sessionize",
    "asof_attribution", "streaming_windowed_counts",
    # -- never-driver-checked: corpus hygiene + layout + misc --
    "pii_scrub", "quality_rules_filter", "span_dedup_docs",
    "source_mixture_sample", "zorder_data_skipping",
    "cluster_keeper_quality", "salted_group_counts", "tfidf_top_terms",
    # -- never-driver-checked: remaining tpch_full shapes --
    "q3_shipping_priority", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q11_important_stock",
    "q13_customer_distribution", "q15_top_supplier", "q16_supplier_cnt",
    "q18_large_volume", "q20_potential_promotion",
    "q21_suppliers_kept_waiting", "q22_global_sales_opportunity",
    # -- new round-3 queries (never driver-checked) --
    "semantic_dedup", "dsir_importance_weights",
    "mixture_temperature_weights", "embedding_cosine_neardup_gemm",
    "vocab_encode_docs", "bigram_lm_nll", "bm25_topdf_terms",
    "chunk_documents", "char_entropy", "winnow_fingerprints",
    # -- family representatives (kept in-window to catch regressions) --
    "dedup_exact", "minhash_signatures", "ngram_jaccard_pairs",
    "dedup_clusters", "cosine_topk", "text_quality",
    "repetition_quality", "benchmark_contamination",
    "assign_scalable", "range_join_bands",
    "q1_pricing_summary", "full_outer_diff", "native_max_by",
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
        temporal, training, graph, scrub, layout,
    )
    _LOADED = True
